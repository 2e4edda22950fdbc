#!/bin/bash
# Stack-sample one JVM thread (default "main", where every Spark action
# plans and submits): tools/sample_driver.sh <pid> [n] [interval_s] [thread]
# Prints the most frequent topmost-interesting frame across samples —
# the driver-side gap dissection (what fills the time between jobs).
pid=$1; n=${2:-80}; iv=${3:-0.05}; th=${4:-\"main\"}
for i in $(seq 1 "$n"); do
  jstack "$pid" 2>/dev/null | awk -v th="$th" '
    $0 ~ "^"th { grab=1; next }
    grab && /^\tat / {
      print $2; c++; if (c >= 3) { exit }
    }
    grab && /^$/ { exit }
  ' | paste -sd'|'
  sleep "$iv"
done | sort | uniq -c | sort -rn | head -30
