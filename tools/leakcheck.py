#!/usr/bin/env python3
"""Repo-side leak scan with run provenance.

The driver's LEAKCHECK.json records only category hit lists, so consecutive
rounds are indistinguishable except for the round number. This scanner
re-runs equivalent checks over the repo's own sources and emits
LEAKCHECK_r{N}.json with a scan timestamp, the file count and byte volume
scanned, and the git HEAD — so each round's artifact is evidence the scan
actually ran against that round's tree.

Usage: python3 tools/leakcheck.py [round_number]
       (round defaults to max CORRECTNESS_r*.json + 1, like Bench's
        numbered artifact)
"""
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CATEGORIES = {
    # non-public package/import roots (anything not spark/scala/java/graft)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|scala\.|java\.|javax\.|graft\.)"
        r"(com|net|io|ai)\.[a-z]", re.M),
    # URLs that are not apache/github/localhost docs references or the
    # RFC-2606 / scaladoc-example hosts the PII+blocklist fixtures use
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|www\.apache|spark\.apache|"
        r"github\.com|issues\.apache|docs\.oracle|en\.wikipedia|"
        r"[\w.-]*example\.(com|org|net)|b\.org|www\.site|blog)[\w.-]+"),
    "internal-bucket": re.compile(r"(s3|gs|abfss?)://[\w.-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*slack"),
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|xox[bap]-[0-9A-Za-z-]{10,}|sk-[A-Za-z0-9]{20,}|"
        r"-----BEGIN (RSA |EC )?PRIVATE KEY-----"),
    "env-secret": re.compile(
        r"(AWS_SECRET|API_KEY|ACCESS_TOKEN|PASSWORD)\s*[=:]\s*['\"][^'\"]{8,}"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sh", ".sql", ".conf"}
SKIP_DIRS = {".git", "target", "project", "spark-warehouse", ".claude", ".bsp"}


def files():
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for f in filenames:
            if os.path.splitext(f)[1] in SCAN_EXT:
                yield os.path.join(dirpath, f)


def main():
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    n_bytes = 0
    for path in files():
        # the leak scanners themselves contain the patterns they hunt
        if os.path.basename(path) == "leakcheck.py" or \
                os.path.basename(path).startswith("LEAKCHECK"):
            continue
        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                text = fh.read()
        except OSError:
            continue
        n_files += 1
        n_bytes += len(text)
        rel = os.path.relpath(path, ROOT)
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}: {m.group(0)[:80]}")
    if len(sys.argv) > 1:
        rnd = int(sys.argv[1])
    else:
        rx = re.compile(r"CORRECTNESS_r(\d+)\.json")
        rounds = [int(m.group(1)) for f in os.listdir(ROOT)
                  for m in [rx.match(f)] if m]
        rnd = (max(rounds) + 1) if rounds else 0
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "git_head": head,
        "n_files_scanned": n_files,
        "n_bytes_scanned": n_bytes,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    dest = os.path.join(ROOT, f"LEAKCHECK_r{rnd:02d}.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"wrote {dest}: {out['n_hits']} hits over {n_files} files")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
