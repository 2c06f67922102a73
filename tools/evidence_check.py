#!/usr/bin/env python3
"""Round-close evidence checker (r12 verdict #2).

Two drift classes recurred in r11/r12: (1) SURVEY/CLAUDE citing a
BENCH_*/SPILL_*/TESTS_*/CORRECTNESS_* artifact that was never committed,
and (2) a TESTS_r*.txt recorded BEFORE the round's last code commit (so
the committed log cannot have tested the final tree). This checker makes
both structural:

  python3 tools/evidence_check.py        # exit 0 = evidence consistent

Checks:
  A. Every artifact filename cited in SURVEY.md / CLAUDE.md / README.md /
     DEPLOYMENT.md / SF1_DRYRUN.md matching
     (BENCH|SPILL_BUDGET|TESTS|CORRECTNESS|PIPELINE|COPYCHECK|LEAKCHECK)
     _*.json|txt exists in the repo root.
  B. The HIGHEST-round TESTS_r{N}.txt postdates the last commit touching
     src/ (git commit time if the log is committed, mtime if not yet) —
     i.e. the committed test log ran on the final tree.
  C. Same staleness rule for the newest BENCH_r{N}_local.json (r14 verdict
     #10: the r14 local bench artifact predated the round's batch-4 code
     commit, so the committed numbers did not cover the final tree).

Driver-written per-round files (VERDICT/ADVICE reference artifacts of
rounds the judge produced) count as existing only if actually on disk —
that is the point.
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["SURVEY.md", "CLAUDE.md", "README.md", "DEPLOYMENT.md", "SF1_DRYRUN.md"]
CITE = re.compile(
    r"\b((?:BENCH|SPILL_BUDGET|TESTS|CORRECTNESS|PIPELINE|COPYCHECK|LEAKCHECK)"
    r"_[A-Za-z0-9_]+\.(?:json|txt))\b")


def git(*args):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True).stdout.strip()


def main():
    errs = []

    # A. cited artifacts exist
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        for ln_no, line in enumerate(open(p, encoding="utf-8"), 1):
            for name in CITE.findall(line):
                if not os.path.exists(os.path.join(REPO, name)):
                    errs.append(f"{doc}:{ln_no} cites {name} which does not exist in the tree")

    # B/C. newest TESTS log and newest local bench artifact postdate the
    # last src/ commit (an artifact recorded before the final code change
    # cannot be evidence about the final tree)
    src_ct = git("log", "-1", "--format=%ct", "--", "src/")

    def check_stale(pattern, what):
        arts = sorted(
            (f for f in os.listdir(REPO) if re.fullmatch(pattern, f)),
            key=lambda f: int(re.search(r"\d+", f).group()))
        if not (arts and src_ct):
            return arts
        newest = arts[-1]
        committed_ct = git("log", "-1", "--format=%ct", "--", newest)
        dirty = bool(git("status", "--porcelain", "--", newest))
        # a re-recorded-but-not-yet-committed log is newer than its last
        # commit — judge it by mtime, not by the stale commit time
        if committed_ct and not dirty:
            ts, kind = int(committed_ct), "commit time"
        else:
            ts = int(os.path.getmtime(os.path.join(REPO, newest)))
            kind = "mtime (uncommitted changes)" if committed_ct else "mtime (uncommitted)"
        if ts < int(src_ct):
            errs.append(
                f"{newest} ({kind} {ts}) predates the last src/ commit ({src_ct}) — "
                f"re-record the {what} after the final code change")
        return arts

    tests = check_stale(r"TESTS_r\d+\.txt", "test log")
    check_stale(r"BENCH_r\d+_local\.json", "local bench artifact")

    if errs:
        for e in errs:
            print(f"EVIDENCE DRIFT: {e}", file=sys.stderr)
        sys.exit(1)
    print(f"evidence_check: OK ({len(DOCS)} docs scanned, "
          f"newest test log {tests[-1] if tests else 'none'})")


if __name__ == "__main__":
    main()
