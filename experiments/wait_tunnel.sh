#!/bin/bash
# Poll the axon TPU tunnel until it accepts connections, then run a real
# device probe.  Used when the tunnel relay (externally managed) drops and
# the harness needs time to restore it.  Exits 0 once a JAX op executes on
# the TPU; exits 1 after the deadline.
DEADLINE=${1:-7200}   # seconds to keep polling
start=$(date +%s)
while true; do
  now=$(date +%s)
  if (( now - start > DEADLINE )); then
    echo "tunnel-wait: deadline (${DEADLINE}s) exceeded"; exit 1
  fi
  if python - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", 8082)); sys.exit(0)
except Exception:
    sys.exit(1)
finally:
    s.close()
EOF
  then
    echo "tunnel-wait: port 8082 open at $(date -u +%H:%M:%S); probing device"
    if timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))"; then
      echo "tunnel-wait: TPU live"; exit 0
    fi
    echo "tunnel-wait: probe failed; settling 120s"; sleep 120
  else
    sleep 60
  fi
done
