#!/bin/bash
# Watch R3D2: the moment its stage E starts (keypoints stages B-D are done
# and committed), kill the R3D2 process tree BY PID (no pattern kills) and
# launch the reordered R3E queue in its place.  R3E's stage E re-runs the
# tune from scratch, so cutting R3D2's stage E mid-flight loses nothing.
set -u
cd /root/repo
R3D2_PID=$(cat /tmp/r3d2.pid)

kill_tree() {  # depth-first kill by explicit pid walk
  local pid=$1
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}

while kill -0 "$R3D2_PID" 2>/dev/null; do
  if grep -q "^== E\." experiments/r3d2_queue.log 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) stage E detected; swapping to R3E" >> experiments/r3_swap.log
    kill_tree "$R3D2_PID"
    sleep 10
    nohup bash experiments/run_r3e_onchip.sh > experiments/r3e_queue.log 2>&1 &
    echo $! > /tmp/r3e.pid
    echo "$(date -u +%H:%M:%S) R3E launched pid $(cat /tmp/r3e.pid)" >> experiments/r3_swap.log
    exit 0
  fi
  sleep 60
done
# R3D2 exited on its own (all stages done or killed externally): if R3E was
# never launched, start it so the heatmap run still happens.
if [ ! -f /tmp/r3e.pid ]; then
  nohup bash experiments/run_r3e_onchip.sh > experiments/r3e_queue.log 2>&1 &
  echo $! > /tmp/r3e.pid
  echo "$(date -u +%H:%M:%S) R3D2 exited; R3E launched pid $(cat /tmp/r3e.pid)" >> experiments/r3_swap.log
fi
