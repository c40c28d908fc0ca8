#!/usr/bin/env bash
# Supervise a `-mode zero` training run against transient TPU tunnel faults.
#
# The tunneled TPU backend occasionally kills the process with a transient
# error (UNAVAILABLE / FailedPrecondition), or wedges silently (the process
# sleeps in futex with ~zero CPU and the log stops advancing — CLAUDE.md).
# The zero loop's resume already recovers state from the last checkpoint +
# record files, so the supervisor just has to notice and relaunch — the
# single-process analogue of the reference server's worker-loss tolerance
# (zero_server.cpp:86,148: a dead worker drops off; the job continues).
#
#   scripts/zero_supervisor.sh <run_dir> <conf_str> [max_restarts] [stall_secs]
#
# Exits 0 when the training loop completes, 1 after max_restarts failures.
set -u

run_dir="${1:?run dir}"
conf="${2:?conf_str (or path to a .cfg file)}"
max_restarts="${3:-50}"
stall_secs="${4:-900}"
log="${run_dir}.launch.log"

# a conf that names an existing file is passed as -conf_file (lets a resume
# reuse the exact ckpt-embedded config dumped to disk)
conf_flag="-conf_str"
[ -f "$conf" ] && conf_flag="-conf_file"

# never orphan the trainer: killing the supervisor must kill the child,
# or a supervisor restart would run two trainers against one run_dir.
# TERM/INT must also EXIT (not fall back into the relaunch loop), else
# `kill <supervisor>` kills the current trainer and then restarts it.
child=""
trap '[ -n "$child" ] && kill "$child" 2>/dev/null' EXIT
trap '[ -n "$child" ] && kill "$child" 2>/dev/null; trap - EXIT; exit 143' TERM INT

progress_file() {
    # newest of Training.log / op.log — both advance during an iteration
    ls -t "$run_dir/Training.log" "$run_dir/op.log" 2>/dev/null | head -1
}

for attempt in $(seq 0 "$max_restarts"); do
    start_ts=$(date +%s)
    echo "[supervisor] attempt $attempt: launching" >> "$log"
    python -u -m minizero_tpu -mode zero "$conf_flag" "$conf" -run_dir "$run_dir" \
        >> "$log" 2>&1 &
    child=$!

    # watch for silent wedges: no log progress for stall_secs -> kill child
    while kill -0 "$child" 2>/dev/null; do
        sleep 30
        pf=$(progress_file)
        if [ -n "$pf" ]; then
            age=$(( $(date +%s) - $(stat -c %Y "$pf") ))
            run_for=$(( $(date +%s) - start_ts ))
            # allow a long first-compile window before enforcing staleness
            if [ "$age" -gt "$stall_secs" ] && [ "$run_for" -gt "$stall_secs" ]; then
                # a long remote jit compile is indistinguishable from a
                # wedge (both idle the client), so each stall-kill doubles
                # the window: a legitimate slow compile eventually fits,
                # a real wedge still gets collected
                echo "[supervisor] stalled ${age}s, killing $child (next window $((stall_secs * 2))s)" >> "$log"
                stall_secs=$((stall_secs * 2))
                kill "$child" 2>/dev/null
                sleep 10
                kill -9 "$child" 2>/dev/null
                break
            fi
        fi
    done
    wait "$child"
    code=$?
    if [ "$code" -eq 0 ]; then
        echo "[supervisor] completed after $attempt restarts" >> "$log"
        exit 0
    fi
    ran_for=$(( $(date +%s) - start_ts ))
    echo "[supervisor] exit $code after ${ran_for}s" >> "$log"
    if [ "$ran_for" -lt 60 ]; then
        # dying immediately is not a transient fault — back off hard so a
        # real bug can't spin the restart loop
        sleep 60
    else
        sleep 10
    fi
done
echo "[supervisor] giving up after $max_restarts restarts" >> "$log"
exit 1
