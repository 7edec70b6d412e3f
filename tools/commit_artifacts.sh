#!/bin/bash
# Deferred round-artifact committer — spawned DETACHED by graft.Bench
# after it writes BENCH_LATEST.json. The per-round artifacts
# (BENCH_r{N}.json, CORRECTNESS_r{N}.json, LEAKCHECK.json, ...) are
# written by the round driver AFTER the bench JVM exits, so a clean
# `git status` at snapshot time needs a committer that outlives the
# JVM: poll for ~6 minutes, stage exactly the known artifact names,
# and commit whenever something new landed. Idempotent (commits only
# when the stage is non-empty) and safe to run concurrently.
cd "$(dirname "$0")/.." || exit 1
for _ in $(seq 1 8); do
  sleep 45
  for f in BENCH_LATEST.json SLOPES.json QUERIES.md LEAKCHECK.json \
           COPYCHECK.json BENCH_r*.json CORRECTNESS_r*.json BENCH_AB_*.md; do
    [ -e "$f" ] && git add -- "$f" 2>/dev/null
  done
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Record round bench/correctness artifacts" || true
  fi
done
exit 0
