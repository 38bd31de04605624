#!/usr/bin/env python3
"""Self-evidencing leak sweep over src/ (VERDICT r8 'What's wrong' #3).

Runs the same seven probe families the round artifact reports, but emits
provenance fields — scan timestamp, git tree hash, file count — so a
re-run is distinguishable from a hand-bumped round number.

Usage: python3 tools/leakcheck.py [round_number]
Writes LEAKCHECK.json in the repo root and prints it.
"""
import datetime
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Import roots that are public knowledge: JDK, Scala stdlib, Spark, and
# this repo's own package. Only fully-qualified roots are probed —
# lowercase local-val imports (`import spark.implicits._`) are Scala
# session imports, not packages.
PUBLIC_IMPORT_ROOTS = (
    "java.", "javax.", "com.sun.", "jdk.", "scala.",
    "org.apache.spark.", "org.apache.hadoop.", "org.apache.parquet.",
    "org.apache.derby.", "org.scalatest.", "org.scalatestplus.",
    "org.scalacheck.", "org.junit.", "graft.",
    # jackson-databind is Apache-2.0 and ships in /opt/spark/jars as
    # Spark's own JSON dependency (the OTLP wire spec parses received
    # documents with it) — public by the same standard as Spark itself
    "com.fasterxml.jackson.",
)

PROBES = {
    # import of a non-public package root (proprietary framework/package)
    "internal-import": re.compile(
        r"^\s*import\s+(?!(" + "|".join(re.escape(r) for r in PUBLIC_IMPORT_ROOTS)
        + r"))(?:com|org|net|io|ai|dev|co)\.[\w.]+",
        re.M),
    # any URL that is not localhost/127.0.0.1/example.com or a spec/citation
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|0\.0\.0\.0|example\.com|www\.w3\.org|github\.com|spark\.apache\.org)[\w.-]+"),
    # package coordinates that look like internal group ids
    "internal-pkg2": re.compile(r"\b(?:com|io|ai)\.(?:anthropic|internal|corp)[\w.]*"),
    # cloud bucket references with a concrete bucket name (scheme://...
    # placeholders in docs are not a named bucket)
    "internal-bucket": re.compile(r"\b(?:s3|s3a|gs|gcs|abfss?)://[\w-]{3,}[\w./-]*"),
    # slack links / channel shorthand
    "slack-link": re.compile(r"(?:slack\.com/|\bgo/[a-z-]{2,}\b|#[a-z]+-[a-z-]+-(?:eng|team|feedback)\b)"),
    # anything that looks like a credential
    "api-key": re.compile(r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16}|api[_-]?key\s*[:=]\s*['\"][^'\"]{8,})"),
    # suspicious non-public env vars (repo's own SPARK_GRAFT_* are public)
    "axon-env": re.compile(r"sys\.env[^\n]*?[\"'](?!SPARK_GRAFT_|SPARK_|JAVA_|HOME|PATH|USER)[A-Z][A-Z0-9_]{4,}[\"']"),
}


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    files = sorted(ROOT.glob("src/**/*.scala")) + sorted(ROOT.glob("tools/*.py")) \
        + [ROOT / "build.sbt"]
    hits = {k: [] for k in PROBES}
    for f in files:
        text = f.read_text(errors="replace")
        rel = str(f.relative_to(ROOT))
        for name, rx in PROBES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{rel}:{line}:{m.group(0)[:120]}")
    tree = subprocess.run(
        ["git", "rev-parse", "HEAD^{tree}"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip() != ""
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "git_tree_hash": tree,
        "working_tree_dirty": dirty,
        "n_files_scanned": len(files),
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "hits"}, indent=2))
    if out["n_hits"]:
        for k, v in hits.items():
            for h in v:
                print(f"HIT [{k}] {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
