#!/bin/bash
# Serialized TPU work queue. The axon tunnel wedges under client churn
# (CLAUDE.md): exactly ONE TPU process may run at a time, clean exits
# only. Stages are shell scripts dropped into $Q/pending; they run in
# lexicographic order, one at a time, each logging to $Q/logs/<name>.log
# with its exit code recorded in $Q/done/<name>.rc. Enqueue new stages
# while the queue runs by writing into $Q/pending.
#
#   Q=/tmp/tpuq bash scripts/tpu_queue.sh &
#   echo $! > /tmp/tpuq.pid            # stop later: kill $(cat /tmp/tpuq.pid)
Q=${Q:-/tmp/tpuq}
mkdir -p "$Q/pending" "$Q/running" "$Q/done" "$Q/logs"
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
while true; do
    if [ -f "$Q/stop" ]; then echo "queue: stop requested"; exit 0; fi
    next=$(ls "$Q/pending" 2>/dev/null | sort | head -1)
    if [ -z "$next" ]; then sleep 20; continue; fi
    mv "$Q/pending/$next" "$Q/running/$next"
    echo "queue: start $next $(date +%H:%M:%S)"
    bash "$Q/running/$next" > "$Q/logs/${next%.sh}.log" 2>&1
    rc=$?
    echo "$rc" > "$Q/done/${next%.sh}.rc"
    mv "$Q/running/$next" "$Q/done/$next"
    echo "queue: done $next rc=$rc $(date +%H:%M:%S)"
    # settle time between TPU clients (tunnel drains the dead session)
    sleep 30
done
