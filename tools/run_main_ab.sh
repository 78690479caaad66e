#!/bin/bash
# Interleaved-A/B variant of run_main.sh: GRAFT_CLASSES selects the
# compiled classes dir (e.g. an r8 worktree's target), everything else
# identical. DELEGATES to run_main.sh (r21 ADVICE): the whole premise is
# identical JVM flags across builds, so the flag list must have exactly
# one home — run_main.sh reads GRAFT_CLASSES itself.
# Usage: GRAFT_CLASSES=/tmp/graft_r8/target/scala-2.13/classes \
#        tools/run_main_ab.sh graft.Bench
exec "$(dirname "$0")/run_main.sh" "$@"
