#!/bin/bash
# Poll the axon tunnel; the moment a non-CPU backend answers, launch the
# round-3 measurement session (once).  Probe is a killable subprocess —
# jax.devices() hangs forever while the relay is down.
set -u
cd /root/repo
mkdir -p probes/out
MARK=probes/out/.session_launched
while true; do
  if [ -f "$MARK" ]; then
    echo "$(date -u +%H:%M:%SZ) session already launched; watcher exiting"
    exit 0
  fi
  if timeout 90 python -c "import jax, sys; sys.exit(0 if any(d.platform != 'cpu' for d in jax.devices()) else 1)" 2>/dev/null; then
    echo "$(date -u +%H:%M:%SZ) TUNNEL UP — launching measurement session"
    touch "$MARK"
    nohup bash probes/r3_tpu_session.sh > probes/out/r3_session.log 2>&1 &
    echo $! > probes/out/session.pid
    exit 0
  fi
  echo "$(date -u +%H:%M:%SZ) tunnel still down"
  sleep 240
done
