#!/bin/bash
# Peak-transient-disk sampler for scale dry-runs (r9 verdict #4): samples
# du -sb of the given directories every INTERVAL seconds while a run is in
# flight and prints the per-dir PEAK when stopped. Usage:
#   tools/spill_sampler.sh <outFile> <intervalSec> <dir> [dir...]
# Stop with SIGTERM/SIGINT; the peak lines are appended to <outFile>.
out="$1"; interval="$2"; shift 2
declare -A peak
trap 'for d in "$@"; do echo "peak_bytes $d ${peak[$d]:-0}" >> "$out"; done; exit 0' TERM INT
while true; do
  for d in "$@"; do
    b=$(du -sb "$d" 2>/dev/null | cut -f1)
    [ -n "$b" ] && [ "$b" -gt "${peak[$d]:-0}" ] && peak[$d]=$b
  done
  sleep "$interval"
done
