#!/bin/bash
# Deferred round-artifact committer — spawned DETACHED by graft.Bench
# after it writes BENCH_LATEST.json. The per-round artifacts
# (BENCH_r{N}.json, CORRECTNESS_r{N}.json, LEAKCHECK.json, ...) are
# written by the round driver AFTER the bench JVM exits, so a clean
# `git status` at snapshot time needs a committer that outlives the
# JVM: poll for ~6 minutes and commit whenever a new artifact landed.
# The commit names its pathspec explicitly, so content anyone else
# staged during the polling window is never swept into the artifact
# commit. Idempotent and safe to run concurrently.
cd "$(dirname "$0")/.." || exit 1
for _ in $(seq 1 8); do
  sleep 45
  paths=()
  for f in BENCH_LATEST.json SLOPES.json QUERIES.md LEAKCHECK.json \
           COPYCHECK.json BENCH_r*.json CORRECTNESS_r*.json BENCH_AB_*.md; do
    [ -e "$f" ] && paths+=("$f")
  done
  [ "${#paths[@]}" -eq 0 ] && continue
  git add -- "${paths[@]}" 2>/dev/null
  # Commit ONLY the artifact pathspec; a no-change commit fails quietly.
  if ! git diff --cached --quiet -- "${paths[@]}" 2>/dev/null; then
    git commit -q -m "Record round bench/correctness artifacts" -- "${paths[@]}" || true
  fi
done
exit 0
