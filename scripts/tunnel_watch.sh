#!/bin/bash
# Poll the axon tunnel until the TPU answers, then IMMEDIATELY run the
# serialized measurement battery (scripts/round3_measure.sh) — hardware
# windows have been scarce this round and must not be wasted on waiting
# for a human-in-the-loop.
#
# ONE TPU client at a time: while this script is alive (probing or
# measuring) nothing else may touch the backend. Liveness markers:
#   /tmp/tpu_probe_start   — a probe attempt is in flight
#   /tmp/tpu_up            — tunnel answered (device string inside)
#   /tmp/measure_running   — battery in progress (log: /tmp/measure_auto.log)
#   /tmp/measure_done      — battery finished; TPU is free for other clients
#
# Cheap first-stage poll: the tunnel's HTTP endpoint (127.0.0.1:8083)
# connects instantly when the terminal is up and times out when it is
# not — that costs 5 s per probe instead of the 300 s jax.devices()
# hang, so we can poll every 60 s without wasting the window.
rm -f /tmp/tpu_up /tmp/measure_running /tmp/measure_done
while true; do
  date +%s > /tmp/tpu_probe_start
  if timeout 5 curl -s -o /dev/null http://127.0.0.1:8083/ 2>/dev/null; then
    # endpoint answers — confirm with a real device query + tiny compute
    out=$(timeout 420 python -c "import jax, jax.numpy as jnp; d=jax.devices(); x=jnp.ones((8,128)); (x@x.T).sum().block_until_ready(); print(d)" 2>/dev/null)
    rc=$?
    rm -f /tmp/tpu_probe_start
    if [ $rc -eq 0 ] && echo "$out" | grep -qi "tpu\|axon"; then
      echo "$out" > /tmp/tpu_up
      echo "TPU reachable: $out"
      break
    fi
    echo "$(date +%H:%M:%S) endpoint up but device probe failed (rc=$rc); retry in 60s"
  else
    rm -f /tmp/tpu_probe_start
    echo "$(date +%H:%M:%S) tunnel endpoint down; retry in 60s"
  fi
  sleep 60
done
touch /tmp/measure_running
GAGS_BENCH_RETUNE=1 bash /root/repo/scripts/round3_measure.sh > /tmp/measure_auto.log 2>&1
rm -f /tmp/measure_running
touch /tmp/measure_done
echo "battery complete; log at /tmp/measure_auto.log"
