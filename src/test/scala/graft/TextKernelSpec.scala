package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NativeTextOps, TextKernel, TextOps}

/** TextKernel ⇔ Column-algebra equivalence: the one-pass natives that
  * replaced the regex/HOF hot paths of the curation family (q31/q45/q46/
  * q47/q64/q99/q217) must be EXACTLY the declarative semantics — the
  * DuckDB oracle rows are generated from those semantics. Property-tested
  * over adversarial strings: whitespace runs (incl. \x0B vs trim's
  * space-only contract), leading/trailing separators (Java split's empty
  * tokens), casing edge cases (İ expands under ROOT lower), CJK, and
  * supplementary-plane code points.
  */
class TextKernelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  NativeTextOps.register(spark)

  // Deterministic adversarial generator (seeded; no framework needed):
  // compositions of stopword-ish tokens, whitespace runs, punctuation,
  // non-ASCII casing/CJK/supplementary fragments, glued with and without
  // separators, with leading/trailing separators mixed in.
  private val fragments = Vector(
    "the", "a", "of", "and", "to", "in", "is", "The", "AND", "OF", "thee",
    "andy", "a1", "xx", " ", "  ", "\t", "\n", "\f", "\r", "", "!",
    "##", "...", "\u4e2d\u6587", "\u0130", "\u212aK", "\u00e9", "\u00df", "\ud835\udd4f",
    "0", "42x", "x-y.z", "quickbrown", "A9", ".", ",the", "the.")
  private def genTexts(n: Int): Seq[String] = {
    val rnd = new java.util.Random(20260816L)
    (0 until n).map { _ =>
      val parts = (0 until rnd.nextInt(12)).map(_ => fragments(rnd.nextInt(fragments.size)))
      val glue = rnd.nextInt(3) match {
        case 0 => parts.mkString("")
        case 1 => parts.mkString(" ")
        case _ => parts.mkString(if (rnd.nextBoolean()) "\t" else "  ")
      }
      rnd.nextInt(5) match {
        case 0 => " " + glue
        case 1 => glue + " "
        case 2 => "\t" + glue + "\n"
        case _ => glue
      }
    }
  }

  /** The pre-kernel declarative forms, verbatim (the oracle semantics). */
  private def refFrame(texts: Seq[String]) = {
    val ws = TextOps.words(col("text"))
    val stopArr = array(Seq("the", "a", "of", "and", "to", "in", "is").map(lit): _*)
    val markers = array(Seq("the", "and", "a", "of").map(lit): _*)
    texts.toDF("text").select(
      TextOps.normalizedRef(col("text")).as("norm"),
      length(col("text")).cast(LongType).as("n_chars"),
      size(ws).cast(LongType).as("n_words"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast(LongType).as("n_punct"),
      size(filter(ws, w => array_contains(stopArr, w))).cast(LongType).as("n_stop"),
      size(filter(ws, w => array_contains(markers, w))).cast(LongType).as("n_en"),
      aggregate(transform(ws, w => length(w).cast(LongType)), lit(0L), (a, x) => a + x)
        .as("sum_word_len"),
      col("text").rlike("[\\x{4e00}-\\x{9fff}]").as("has_cjk"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .cast(LongType).as("n_bpe"))
  }

  private def kernelFrame(texts: Seq[String]) = {
    val tf = NativeTextOps.textFeatures(col("text"))
    texts.toDF("text").select(
      NativeTextOps.normalizedText(col("text")).as("norm"),
      tf.getField("n_chars").as("n_chars"),
      tf.getField("n_words").as("n_words"),
      tf.getField("n_punct").as("n_punct"),
      tf.getField("n_stop").as("n_stop"),
      tf.getField("n_en").as("n_en"),
      tf.getField("sum_word_len").as("sum_word_len"),
      tf.getField("has_cjk").as("has_cjk"),
      NativeTextOps.bpeCount(col("text")).as("n_bpe"))
  }

  private def assertSame(texts: Seq[String]): Unit = {
    val ref = refFrame(texts).collect()
    val got = kernelFrame(texts).collect()
    texts.indices.foreach { i =>
      assert(got(i) == ref(i), s"text=[${texts(i)}] kernel=${got(i)} ref=${ref(i)}")
    }
  }

  test("kernel == declarative reference on pinned edge cases") {
    assertSame(Seq(
      "", " ", "   ", "\t", "\n\n", " \t ", "a", " a ", "a  b", "a\tb",
      "\tx y ", "x\n", "the a of and to in is", "THE And OF",
      "the  the", "a!b", "a ! b", "a !! b !", "...", "#a#1#",
      "中文 the 漢字", "İstanbul the", "K the", "é à ü", "𝕏 x 𝕏",
      "ab", "t\fq", "42 4a2 aa44", "  the\t\tof  ",
      "mixed 中EN文 text", "ß sharp", " nbsp the"))
  }

  test("kernel == declarative reference (1000 seeded adversarial strings)") {
    assertSame(genTexts(1000).distinct)
  }

  test("shingleHashes == xxhash64 over materialized shingle strings") {
    val texts = (genTexts(400) ++ Seq(
      "", " ", "a", "a b", "a b c", "a b c d", "\ta b c ", "the  the the",
      "中文 one two three 漢字", "İ a b c", "a\tb\nc d", "x ! y ? z")).distinct
    val ref = texts.toDF("text")
      .withColumn("ws", TextOps.words(col("text")))
      .select(transform(TextOps.shingles3("ws"), s => xxhash64(s)).as("h"))
      .collect().map(_.getSeq[Long](0))
    val got = texts.toDF("text")
      .select(NativeTextOps.shingleHashes(col("text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    texts.indices.foreach { i =>
      assert(got(i) == ref(i), s"text=[${texts(i)}] kernel=${got(i)} ref=${ref(i)}")
    }
  }

  test("md5Hash32 digest-direct == conv(substring(md5)) reference") {
    val texts = (genTexts(300) ++ Seq("", "a", "the quick", "中文", "42", "𝕏")).distinct
    val both = texts.toDF("text").select(
      graft.functions.ScalarOps.md5Hash32(col("text")).as("native"),
      graft.functions.ScalarOps.md5Hash32Ref(col("text")).as("ref"))
      .collect()
    both.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"text=[$t] native=${r.getLong(0)} ref=${r.getLong(1)}")
    }
  }

  test("kernel natives survive whole-stage codegen and constant input") {
    val df = Seq(("the quick brown fox", 1)).toDF("text", "one")
      .select(NativeTextOps.textFeatures(col("text")).getField("n_words").as("w"),
        NativeTextOps.normalizedText(lit("  A!  b  ")).as("n"))
    val row = df.head
    assert(row.getLong(0) == 4L)
    assert(row.getString(1) == "a b")
  }

  test("TextKernel.normalize direct: strip-then-collapse ordering") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(TextKernel.normalize(u("a ! b")).toString == "a b")
    assert(TextKernel.normalize(u("a!b")).toString == "ab")
    assert(TextKernel.normalize(u("  Ab C9  ")).toString == "ab c9")
    assert(TextKernel.normalize(u("a\tb")).toString == "ab") // tab stripped, not a space
    assert(TextKernel.normalize(u("")).toString == "")
    assert(TextKernel.normalize(u("!!!")).toString == "")
  }
}
