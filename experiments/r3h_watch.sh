#!/bin/bash
# Chain R3H after R3G: wait for the R3G queue process to exit, then start
# the heatmap-head run.  Keeps the chip busy across session boundaries.
set -u
cd /root/repo
R3G_PID=${1:?usage: r3h_watch.sh <r3g-pid>}
while kill -0 "$R3G_PID" 2>/dev/null; do sleep 60; done
exec bash experiments/run_r3h_onchip.sh
