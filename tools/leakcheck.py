#!/usr/bin/env python3
"""Self-evidencing leak scan: greps the repo's tracked source for
categories of internal/proprietary references that must never appear
(the build derives from public knowledge only). Writes LEAKCHECK.json
with scan metadata (UTC time, HEAD commit, file count) so each round's
0-hit claim is reproducible, not hand-editable.

Usage: python3 tools/leakcheck.py  (from the repo root)
"""
import json, re, subprocess, datetime, os, sys

CATEGORIES = {
    # proprietary/internal package imports (nothing outside spark/scala/java
    # /graft namespaces may be imported)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.spark|org\.apache\.parquet|org\.apache\.derby"
        r"|scala|java|graft|org\.scalatest|org\.scalacheck|org\.slf4j"
        r"|com\.fasterxml\.jackson)"  # jackson ships in /opt/spark/jars
        r"(com|net|io|ai)\.[a-z]", re.M),
    # URLs that aren't apache/github/ietf/wikipedia-class public docs
    # (example.com/org are RFC 2606 reserved test hosts; isthe.com is the
    # published FNV hash specification)
    "internal-url": re.compile(
        r"https?://(?!www\.apache|spark\.apache|github\.com|raw\.githubusercontent"
        r"|datatracker\.ietf|www\.ietf|en\.wikipedia|prestodb\.io|duckdb\.org"
        r"|docs\.oracle|www\.rfc-editor|localhost|127\.0\.0\.1"
        r"|[a-z0-9.-]*example\.(?:com|org|net)|www\.isthe\.com)[a-z0-9.-]+\.[a-z]{2,}"),
    "internal-pkg2": re.compile(r"\b(?:anthropic|claude)[-_.][a-z]", re.I),
    "internal-bucket": re.compile(r"\b(?:s3|gs|gcs|abfss?)://[a-z0-9._-]+"),
    "slack-link": re.compile(r"\b(?:slack\.com/archives|go/[a-z][a-z0-9-]{2,})\b"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    "axon-env": re.compile(r"\b[A-Z_]*(?:ANTHROPIC|CLAUDE|AXON)[A-Z_]*\s*="),
}

def main():
    files = subprocess.run(
        ["git", "ls-files", "src", "tools", "*.md", "*.sbt", "project"],
        capture_output=True, text=True).stdout.split()
    hits = {k: [] for k in CATEGORIES}
    scanned = 0
    for f in files:
        if not os.path.isfile(f):
            continue
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        scanned += 1
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}: {m.group(0)[:80]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    out = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "head_commit": head,
        "files_scanned": scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("LEAKCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"scanned {scanned} files, {out['n_hits']} hits")

if __name__ == "__main__":
    main()
