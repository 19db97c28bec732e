#!/usr/bin/env python3
"""Builder-side leak scan with provenance. The driver's LEAKCHECK.json
carries only a round number; this scan records WHAT was scanned (commit
SHA, file count, line count) alongside the hit lists, so a stale
re-stamp is distinguishable from a real clean scan.

Scans every tracked text file for: non-public URLs, cloud bucket URIs,
credential material, suspicious environment variables, and
internal-looking package imports. Public infrastructure domains that a
Spark/OPC UA project legitimately references are allowlisted.

Usage: python3 tools/leakcheck_builder.py [--out LEAKCHECK_BUILDER.json]
Exit 0 when clean, 1 when any hit survives the allowlist.
"""
import json, re, subprocess, sys, time

PUBLIC_DOMAINS = (
    "apache.org", "opcfoundation.org", "github.com", "w3.org", "scala-lang.org",
    "scalatest.org", "duckdb.org", "postgresql.org", "db.apache.org",
    "example.com", "localhost", "127.0.0.1", "itu.int", "ietf.org",
    "opc.tcp://",  # fixture endpoint URLs in specs/config
)

PATTERNS = {
    "url": re.compile(r"https?://[\w.\-]+"),
    "bucket": re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?|wasbs?)://[\w.\-/]+"),
    "private-key": re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
    "aws-key": re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
    "bearer-token": re.compile(r"\b(?:xox[bap]-|ghp_|gho_|sk-[A-Za-z0-9]{20})"),
    "slack-link": re.compile(r"\b(?:go|slack)/[a-z][\w\-]+\b"),
}

def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True, check=True)
    return [f for f in out.stdout.splitlines()
            if not f.endswith((".parquet", ".png", ".jpg", ".p12", ".der"))
            # the scanner's own pattern definitions and its output artifacts
            # would otherwise match themselves on every run
            and f != "tools/leakcheck_builder.py"
            and not f.startswith("LEAKCHECK")]

def main(out_path):
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, check=True).stdout.strip()
    hits = {k: [] for k in PATTERNS}
    n_files = n_lines = 0
    for path in tracked_files():
        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                lines = fh.readlines()
        except OSError:
            continue
        n_files += 1
        n_lines += len(lines)
        for i, line in enumerate(lines, 1):
            for kind, rx in PATTERNS.items():
                for m in rx.finditer(line):
                    tok = m.group(0)
                    if kind == "url" and any(d in tok for d in PUBLIC_DOMAINS):
                        continue
                    hits[kind].append(f"{path}:{i}: {tok}")
    n_hits = sum(len(v) for v in hits.values())
    artifact = {
        "commit": sha,
        "scanned_files": n_files,
        "scanned_lines": n_lines,
        "scan_time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_hits": n_hits,
        "hits": hits,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(f"{out_path}: {n_files} files / {n_lines} lines @ {sha[:10]} -> {n_hits} hits")
    for k, v in hits.items():
        for h in v:
            print(f"  {k}: {h}")
    return 1 if n_hits else 0

if __name__ == "__main__":
    out = "LEAKCHECK_BUILDER.json"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    sys.exit(main(out))
