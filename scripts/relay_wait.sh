#!/bin/bash
# Block until the TPU relay answers a trivial device op (it can take
# several minutes to drain after a killed client).
for i in $(seq 1 30); do
  if timeout 180 python -c \
    "import jax, jax.numpy as jnp; (jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()" \
    >/dev/null 2>&1; then
    echo "relay healthy (attempt $i)"
    exit 0
  fi
  echo "relay not ready (attempt $i); sleeping 30s" >&2
  sleep 30
done
echo "relay never recovered" >&2
exit 1
