#!/usr/bin/env python3
"""Repo-side leak scan with provenance (VERDICT r9 item 6).

Scans all tracked source/doc files for content that must never appear
in a public-knowledge-only build: imports outside the allowed public
roots, non-allowlisted URLs, cloud bucket URIs, chat links, secret-
shaped strings, and env-var reads outside the project's own namespace.
Emits LEAKCHECK.json in the driver's category schema, stamped with the
scan timestamp and HEAD commit so every report is attributable to the
exact tree it scanned.

Usage: python3 scripts/leakcheck.py [round_number]
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Public roots the build is allowed to import from: Spark/JDK/project
# Scala packages, value imports of a local session's implicits, and
# the Python stdlib + DuckDB/pandas the DRIVER-SIDE scripts use
# (scripts/ never ships in the library).
ALLOWED_IMPORT = re.compile(
    r"^\s*import\s+(org\.apache\.spark|org\.apache\.hadoop|"
    r"org\.apache\.parquet|scala\b|"
    r"java\b|javax\b|graft\b|org\.scalatest|org\.scalacheck|sbt\b|"
    r"[a-z][A-Za-z0-9_]*(\.[A-Za-z0-9_]+)*\.implicits\._|"
    r"(sys|json|glob|math|re|subprocess|time|os|pathlib|duckdb|pandas|"
    r"tempfile|pyspark)\b)")
# both Scala/Python 'import X' and Python 'from X import Y' (the
# 'from' form requires the trailing import keyword so English prose
# beginning with 'from ...' is not treated as an import)
FROM_IMPORT = re.compile(r"^\s*from\s+([A-Za-z_][\w.]*)\s+import\b")
IMPORT_LINE = re.compile(
    r"^\s*import\s+[a-zA-Z_]|^\s*from\s+[A-Za-z_][\w.]*\s+import\b")


def _import_allowed(line):
    # normalize 'from X import Y' to its module path so the Python
    # form cannot bypass the allowlist
    m = FROM_IMPORT.match(line)
    if m:
        line = "import " + m.group(1)
    return bool(ALLOWED_IMPORT.match(line))


# URLs that are fine to cite (public docs, papers, standards). Each
# domain is anchored: it must be followed by /, :port, or end-of-URL,
# so github.com.evil.example does not pass as github.com.
ALLOWED_URL = re.compile(
    r"https?://(www\.)?("
    r"[a-z0-9.-]*apache\.org|github\.com|arxiv\.org|aclanthology\.org|"
    r"dl\.acm\.org|doi\.org|ieee\.org|openreview\.net|w3\.org|ietf\.org|"
    r"naturalearthdata\.com|duckdb\.org|scala-lang\.org|scala-sbt\.org|"
    r"localhost|en\.wikipedia\.org|"
    # RFC 2606/6761 reserved documentation domains — test fixtures only
    r"([a-z0-9.-]+\.)?example\.(com|org|net))(/|:|$)")
URL = re.compile(r"https?://[^\s\"')>\]]+")

CHECKS = {
    # non-public package imports (anything outside the allowed roots)
    "internal-import": lambda line: (
        bool(IMPORT_LINE.match(line)) and not _import_allowed(line)),
    # URLs not on the public allowlist
    "internal-url": lambda line: any(
        not ALLOWED_URL.match(u) for u in URL.findall(line)),
    # package declarations outside the project's two namespaces
    "internal-pkg2": lambda line: (
        line.strip().startswith("package ")
        and not re.match(r"^\s*package\s+(graft\b|org\.apache\.spark\b)", line)),
    # cloud bucket URIs (generic doc placeholders like s3a://raw/…
    # are fine; any NAMED bucket is not)
    "internal-bucket": lambda line: any(
        not re.match(r"(s3a?|gs|wasbs?|abfss?)://(raw|curated|bucket|data|"
                     r"path|my-bucket|warehouse|lake)\b", u)
        for u in re.findall(r"\b(?:s3a?|gs|wasbs?|abfss?)://[^\s\"'>\]]+", line)),
    # chat / workspace links
    "slack-link": lambda line: bool(
        re.search(r"slack\.com|app\.slack|\.slack\.|go/[a-z-]{2,}\b", line)),
    # secret-shaped strings (cloud keys, bearer tokens, PEM blocks)
    "api-key": lambda line: bool(
        re.search(r"AKIA[0-9A-Z]{16}|xox[baprs]-|sk-[A-Za-z0-9]{20,}|"
                  r"BEGIN (RSA|EC|OPENSSH) PRIVATE KEY", line)),
    # env-var reads outside the project's own namespace; prefixes end
    # in _ and whole names are anchored with $, so USERS_API_TOKEN and
    # HOMEBASE_URL do not pass via USER/HOME
    "axon-env": lambda line: any(
        not re.match(r"(SPARK_|GRAFT_|JAVA_|COURSIER_)|(HOME|PATH|TMPDIR|USER)$", v)
        for v in re.findall(
            r"""sys\.env(?:\.get|\.getOrElse|\.contains)?\(\s*"([A-Z0-9_]+)"|"""
            r"""getenv\(\s*"([A-Z0-9_]+)"|"""
            r"""environ\[\s*['"]([A-Z0-9_]+)""", line)
        for v in [x for x in v if x]),
}

SCAN_SUFFIX = {".scala", ".sbt", ".py", ".sh", ".md", ".json"}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, capture_output=True,
                         text=True, check=True).stdout
    for rel in out.splitlines():
        p = ROOT / rel
        # PAPERS.md / SNIPPETS.md are driver-retrieved PUBLIC reference
        # content (public OSS snippets with their own package names),
        # and ADVICE.md / VERDICT.md are judge-written review text that
        # quotes example attack strings when describing scanner gaps —
        # all out of scope for a scan of what THIS build authored
        if (p.suffix in SCAN_SUFFIX and p.is_file()
                and p.name not in {"LEAKCHECK.json", "PAPERS.md", "SNIPPETS.md",
                                   "ADVICE.md", "VERDICT.md"}):
            yield rel, p


def infer_round():
    """Newest round with committed artifacts (ADVICE r13: a null round
    made the audit record hard to correlate with VERDICT rounds)."""
    import re
    ns = [int(m.group(1)) for p in ROOT.iterdir()
          if (m := re.match(r"(?:BENCH|CORRECTNESS)_r(\d+)\.json$", p.name))]
    return max(ns) if ns else None


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    hits = {k: [] for k in CHECKS}
    for rel, p in tracked_files():
        # the scanner's own pattern table would always match itself
        if rel == "scripts/leakcheck.py":
            continue
        for i, line in enumerate(p.read_text(errors="replace").splitlines(), 1):
            for cat, pred in CHECKS.items():
                if pred(line):
                    hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True, check=True).stdout.strip()
    report = {
        "round": rnd,
        "commit": head,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = ROOT / "LEAKCHECK.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    for cat, v in hits.items():
        for h in v[:20]:
            print(f"  [{cat}] {h}")
    return 1 if report["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
