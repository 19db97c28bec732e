package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.functions.ScalarOps
import graft.operators.{CurrentValues, Dedup, VennJoin}

/** Property-based tests (SURVEY.md §5.3): algebraic laws the operators
  * must satisfy for arbitrary inputs, not just curated examples. Runs
  * under sbt's native ScalaCheck framework.
  */
object PropertySpec extends Properties("graft") {
  private lazy val spark = SparkSpec.spark
  /** One RSA identity for the whole fuzz run (keygen is ~1 s). */
  lazy val fuzzIdentity: graft.sources.OpcuaCrypto.Identity =
    graft.sources.OpcuaCrypto.generateSelfSigned("fuzz")
  import spark.implicits._

  private val scaleGen = for {
    a <- Gen.chooseNum(-1e6, 1e6)
    b <- Gen.chooseNum(-1e6, 1e6)
    slope <- Gen.chooseNum(0.001, 1e3)
    offset <- Gen.chooseNum(-1e3, 1e3)
  } yield (a, b, slope, offset)

  property("scaling monotone for slope>0, anti-monotone for slope<0") =
    forAll(scaleGen) { case (a, b, slope, offset) =>
      (math.abs(a - b) > 1e-3) ==> {
        def scale(vs: Seq[Double], s: Double): Seq[Double] =
          vs.toDF("raw_value")
            .select(ScalarOps.scaleSlopeIntercept(col("raw_value"), s, offset))
            .as[Double].collect().toSeq
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        val Seq(pLo, pHi) = scale(Seq(lo, hi), slope)
        val Seq(nLo, nHi) = scale(Seq(lo, hi), -slope)
        pLo <= pHi && nLo >= nHi
      }
    }

  private val eventsGen = Gen.nonEmptyListOf(for {
    dev <- Gen.oneOf("d1", "d2", "d3")
    m <- Gen.oneOf("temp", "rpm")
    v <- Gen.chooseNum(-100.0, 100.0)
    t <- Gen.chooseNum(0L, 50L)
  } yield (dev, m, v, t)).map(_.take(40))

  property("lastValuePerKey insensitive to input row order") =
    forAll(eventsGen) { evs =>
      val rows = evs.zipWithIndex.map { case ((d, m, v, t), i) =>
        (i.toLong, d, m, v, new Timestamp(1700000000000L + t * 1000))
      }
      def run(xs: Seq[(Long, String, String, Double, Timestamp)]): Set[(String, String, Long)] =
        CurrentValues.lastValuePerKey(
          xs.toDF("event_id", "device", "measure_name", "raw_value", "source_ts"))
          .select("device", "measure_name", "event_id")
          .as[(String, String, Long)].collect().toSet
      run(rows) == run(scala.util.Random.shuffle(rows))
    }

  private val keySetsGen = for {
    l <- Gen.listOf(Gen.chooseNum(0, 30))
    r <- Gen.listOf(Gen.chooseNum(0, 30))
  } yield (l.distinct, r.distinct)

  property("vennJoin partitions the key-union exactly") =
    forAll(keySetsGen) { case (l, r) =>
      val out = VennJoin.vennJoin(l.toDF("k"), r.toDF("k"), Seq("k"))
        .select("k", "status").as[(Int, String)].collect()
      val sized = out.length == (l.toSet ++ r.toSet).size
      val classified = out.forall { case (k, status) =>
        status == (if (l.contains(k) && r.contains(k)) "both"
                   else if (l.contains(k)) "left_only"
                   else "right_only")
      }
      sized && classified
    }

  property("minhash permutation stays in [0, 2^31-1)") =
    forAll(Gen.chooseNum(0, 63), Gen.chooseNum(0L, 0x7FFFFFFFL)) { (j, base) =>
      val h = (Dedup.permA(j) * base + Dedup.permB(j)) % Dedup.MinhashMod
      h >= 0 && h < Dedup.MinhashMod
    }

  property("minhash permutation coefficients distinct across j") =
    Prop((0 until 64).map(Dedup.permA).distinct.size == 64)

  private val intervalGen = for {
    ls <- Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("u1", "u2"), Gen.chooseNum(0L, 600L)))
    rs <- Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("u1", "u2"), Gen.chooseNum(0L, 600L)))
    tol <- Gen.oneOf(30L, 60L, 100L)
  } yield (ls.take(25), rs.take(25), tol)

  property("bucketed RangeJoin equals the naive theta join") =
    forAll(intervalGen) { case (ls, rs, tolSec) =>
      val tolMicros = tolSec * 1000000L
      val left = ls.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, new Timestamp(t * 1000)) }
        .toDF("lid", "k", "ts")
      val right = rs.map { case (u, t) => (u, new Timestamp(t * 1000)) }
        .toDF("k", "ts")
      val bucketed = graft.operators.RangeJoin
        .within(left, right, "k", "ts", "ts", tolMicros)
        .select(col("lid"), unix_micros(col("r_ts")).as("rt"))
        .as[(Long, Long)].collect().sorted.toSeq
      val naive = left.join(right.withColumnRenamed("ts", "rts"), Seq("k"))
        .filter(abs(unix_micros(col("ts")) - unix_micros(col("rts"))) <= tolMicros)
        .select(col("lid"), unix_micros(col("rts")).as("rt"))
        .as[(Long, Long)].collect().sorted.toSeq
      bucketed == naive
    }

  // --------------------------------------------- secured chunk layer

  private val securedMsgGen = for {
    n <- Gen.chooseNum(0, 60000)
    seed <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    mode <- Gen.oneOf(graft.sources.OpcuaCrypto.SecurityModeSign,
      graft.sources.OpcuaCrypto.SecurityModeSignAndEncrypt)
    buf <- Gen.oneOf(8192, 16384, 65536)
  } yield (n, seed, mode, buf)

  property("secured MSG chunks round-trip any payload in both modes and buffer sizes") =
    forAll(securedMsgGen) { case (n, seed, mode, buf) =>
      import graft.sources.OpcuaCrypto._
      import graft.sources.OpcuaFraming._
      import graft.sources.OpcuaSecure._
      // deterministic pseudo-random payload from the seed
      val rnd = new scala.util.Random(seed)
      val payload = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val keys = deriveKeys(
        Array.tabulate[Byte](32)(i => (i + seed).toByte),
        Array.tabulate[Byte](32)(i => (i * 7 + 1).toByte))
      val out = new java.io.ByteArrayOutputStream()
      val mw = new SecureMessageWriter(out, new SeqState, requestId = 5L,
        peerReceiveBufferSize = buf, maxChunkCount = 0L,
        channelId = 2L, tokenId = 9L, mode = mode, sendKeys = keys)
      mw.raw(payload); mw.finish()
      val (rid, body) = readSecureConversation(
        new java.io.ByteArrayInputStream(out.toByteArray), new SeqState,
        Limits(buf, buf, 0L, 0L), channelId = 2L, mode = mode,
        keysFor = t => if (t == 9L) Some(keys) else None, allowOpn = false)
      rid == 5L && java.util.Arrays.equals(body, payload)
    }

  private val fuzzGen = for {
    n <- Gen.chooseNum(0, 4096)
    seed <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    depth <- Gen.oneOf(0, 1, 2)
  } yield (n, seed, depth)

  property("secured OPN parser rejects arbitrary bytes inside the protocol error taxonomy") =
    forAll(fuzzGen) { case (n, seed, depth) =>
      import graft.sources.OpcuaCrypto._
      import graft.sources.OpcuaFraming._
      import graft.sources.OpcuaSecure._
      val rnd = new scala.util.Random(seed)
      val junk = Array.fill[Byte](n)(rnd.nextInt().toByte)
      // depth 0: raw junk (header parse); depth 1: well-formed channel id
      // + policy URI (certificate/thumbprint stage); depth 2: valid
      // header + junk cert + the CORRECT receiver thumbprint + a
      // block-aligned cipher region, so the fuzz reaches the RSA-OAEP
      // decrypt itself (random junk cannot pass the 2^-160 thumbprint
      // gate on its own — an earlier version of this property claimed
      // cipher-stage coverage it never had)
      val body = depth match {
        case 0 => junk
        case 1 => new BufWriter(64 + n).u32(0L).str(Basic256Sha256Uri).raw(junk).result()
        case _ =>
          val ident = PropertySpec.fuzzIdentity
          val cipherLen = (n / 256).max(1) * 256
          val w = new BufWriter(1024 + cipherLen)
          w.u32(0L).str(Basic256Sha256Uri)
          val cert = java.util.Arrays.copyOf(junk, math.min(900, math.max(1, n)))
          w.i32(cert.length).raw(cert)
          w.i32(ident.thumbprint.length).raw(ident.thumbprint)
          w.raw(Array.fill[Byte](cipherLen)(rnd.nextInt().toByte))
          w.result()
      }
      val ident = PropertySpec.fuzzIdentity
      try {
        readSecuredOpnChunk(body, new SeqState, ident)
        true // astronomically unlikely, but a parse that succeeds is not a crash
      } catch {
        case _: OpcuaError => true       // the protocol taxonomy —
        case _: FramingViolation => true // exactly what a server answers with
        case e: Throwable =>
          println(s"escaped the taxonomy: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }
}
