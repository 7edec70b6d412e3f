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
#
# Modes:
#   (no args)  detached poller — spawned by graft.Bench, polls until the
#              new round's artifact set is committed clean (backstop).
#   --once     synchronous single sweep — called INLINE by graft.Bench
#              right before it exits, so everything already on disk
#              (CORRECTNESS_r{N}, BENCH_LATEST, DIAG, SLOPES, ...) is
#              committed by the gate's own exit path (round-13 advisor:
#              three rounds of poller races left artifacts staged).
#              Uses a short 5 s stability window: at bench exit the
#              only fresh file is BENCH_LATEST.json, which this JVM
#              wrote whole and closed.
cd "$(dirname "$0")/.." || exit 1

POLL=45
MAX_POLLS=45   # hard cap ~34 min
STABLE_SECS="$POLL"

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

# mtime stable = not modified within the last stability window.
stable() {
  local now m
  now=$(date +%s)
  m=$(stat -c %Y "$1" 2>/dev/null) || return 1
  [ $((now - m)) -ge "$STABLE_SECS" ]
}

# QUERIES.md is deliberately NOT here: it is source-maintained (committed
# with the feature that changes it), not a driver artifact — sweeping an
# in-progress edit of it into an artifact commit was a round-10 advisor
# finding.
artifact_files() {
  local f
  for f in BENCH_LATEST.json BENCH_RECORD.json SLOPES.json LEAKCHECK.json \
           DIAG.jsonl DIAG.*.jsonl COPYCHECK.json BENCH_r*.json \
           CORRECTNESS_r*.json BENCH_AB_*.md; do
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

# --once: synchronous single sweep with a short stability window, for
# the gate's own exit path. Never loops, never detaches.
if [ "$1" = "--once" ]; then
  STABLE_SECS=5
  sleep 5
  sweep_commit
  exit 0
fi

for _ in $(seq 1 "$MAX_POLLS"); do
  sleep "$POLL"
  sweep_commit || continue
  # The NEW round's CORRECTNESS file exists and the sweep above
  # committed the whole artifact set clean — the driver writes the
  # leak/copy sweeps AFTER correctness, so the done-signal is the
  # full-set sweep, not the trigger file alone. Round-13 advisor: a
  # single final sweep here raced late-arriving artifacts (a failed
  # attempt broke out with files staged) — so keep sweeping until TWO
  # consecutive polls come back clean, bounded by the same hard cap.
  if [ "$(max_round)" -gt "$START_ROUND" ]; then
    clean=0
    for _ in $(seq 1 "$MAX_POLLS"); do
      sleep "$POLL"
      if sweep_commit; then
        clean=$((clean + 1))
        [ "$clean" -ge 2 ] && break
      else
        clean=0
      fi
    done
    break
  fi
done
exit 0
