#!/bin/bash
# Deferred round-artifact committer — spawned DETACHED by graft.Bench
# after it writes BENCH_LATEST.json. The per-round artifacts
# (BENCH_r{N}.json, CORRECTNESS_r{N}.json, LEAKCHECK.json, ...) are
# written by the round driver AFTER the bench JVM exits, so a clean
# `git status` at snapshot time needs a committer that outlives the
# JVM. This repo's round driver provides no exit hook, which is why the
# committer exists at all; it is deliberately narrow:
#
#  - commits ONLY the named artifact pathspec — nothing anyone else
#    staged during the window is ever swept into an artifact commit;
#  - commits a file only once its mtime is STABLE (older than one poll
#    interval), so a JSON the driver is mid-writing is never committed
#    torn — the next poll picks up the finished bytes;
#  - skips any poll where HEAD is not `main` or a rebase/merge is in
#    flight, so commits never land on a bystander branch;
#  - polls until a NEW round's CORRECTNESS_r*.json (one numbered above
#    the max existing at spawn time) has landed, stabilized, and been
#    committed — not a fixed six minutes (rounds 6/8/9/10 all had the
#    driver write final artifacts after a fixed window closed) — with
#    a hard cap as the runaway backstop.
#
# Idempotent and safe to run concurrently. Disable by spawning with
# SPARK_GRAFT_AUTOCOMMIT=0 (see graft.Bench).
cd "$(dirname "$0")/.." || exit 1

POLL=45
MAX_POLLS=45   # hard cap ~34 min

# Highest round number whose CORRECTNESS file exists right now: the
# current round's file (N+1) landing is the done-signal.
max_round() {
  local m=0 f n
  for f in CORRECTNESS_r*.json; do
    [ -e "$f" ] || continue
    n="${f#CORRECTNESS_r}"; n="${n%.json}"; n=$((10#$n))
    [ "$n" -gt "$m" ] && m="$n"
  done
  echo "$m"
}
START_ROUND=$(max_round)

git_quiet() { git "$@" 2>/dev/null; }

# True when it is safe to create a commit: on main, no rebase/merge/
# cherry-pick in flight.
safe_to_commit() {
  [ "$(git_quiet rev-parse --abbrev-ref HEAD)" = "main" ] || return 1
  local g
  g=$(git_quiet rev-parse --git-dir) || return 1
  [ ! -e "$g/rebase-merge" ] && [ ! -e "$g/rebase-apply" ] \
    && [ ! -e "$g/MERGE_HEAD" ] && [ ! -e "$g/CHERRY_PICK_HEAD" ]
}

# mtime stable = not modified within the last poll interval.
stable() {
  local now m
  now=$(date +%s)
  m=$(stat -c %Y "$1" 2>/dev/null) || return 1
  [ $((now - m)) -ge "$POLL" ]
}

# QUERIES.md is deliberately NOT here: it is source-maintained (committed
# with the feature that changes it), not a driver artifact — sweeping an
# in-progress edit of it into an artifact commit was a round-10 advisor
# finding.
artifact_files() {
  local f
  for f in BENCH_LATEST.json SLOPES.json LEAKCHECK.json DIAG.jsonl \
           DIAG.1.jsonl COPYCHECK.json BENCH_r*.json CORRECTNESS_r*.json \
           BENCH_AB_*.md; do
    [ -e "$f" ] && printf '%s\n' "$f"
  done
}

# One atomic add+commit attempt. The round-11 AND round-12 snapshots
# both caught an artifact staged-but-uncommitted: adding a PARTIAL set
# (only the files stable so far) leaves the add→commit sequence racing
# later-arriving artifacts across poll iterations. The fix prescribed
# by the round-12 review: add NOTHING unless the ENTIRE present
# artifact set is stable, then add and commit back-to-back — so the
# staged-but-uncommitted state can never persist past one subshell.
# Returns 0 when every present artifact is committed clean.
sweep_commit() {
  safe_to_commit || return 1
  local paths=() f
  while IFS= read -r f; do
    stable "$f" || return 1   # something still in flight: touch nothing
    paths+=("$f")
  done < <(artifact_files)
  [ "${#paths[@]}" -eq 0 ] && return 1
  git_quiet add -- "${paths[@]}"
  # Commit ONLY the artifact pathspec; a no-change commit fails quietly.
  if ! git diff --cached --quiet -- "${paths[@]}" 2>/dev/null; then
    git commit -q -m "Record round bench/correctness artifacts

No-Verification-Needed: artifact-only commit (bench/correctness JSON)" \
      -- "${paths[@]}" || true
  fi
  # Clean = nothing unstaged AND nothing staged across the whole set.
  git diff --quiet -- "${paths[@]}" 2>/dev/null \
    && git diff --cached --quiet -- "${paths[@]}" 2>/dev/null
}

for _ in $(seq 1 "$MAX_POLLS"); do
  sleep "$POLL"
  sweep_commit || continue
  # Done once the NEW round's CORRECTNESS file exists and the sweep
  # above committed the whole artifact set clean — the driver writes
  # the leak/copy sweeps AFTER correctness, so the done-signal is the
  # full-set sweep, not the trigger file alone. One FINAL sweep next
  # iteration closes the window between this commit and anything the
  # driver wrote while it ran.
  if [ "$(max_round)" -gt "$START_ROUND" ]; then
    sleep "$POLL"
    sweep_commit
    break
  fi
done
exit 0
