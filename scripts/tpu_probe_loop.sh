#!/bin/bash
# Probe the TPU tunnel every 15 min; write status to /tmp/tpu_status.txt
while true; do
  out=$(timeout 180 python -c "
import time, random
t0=time.time()
import jax, jax.numpy as jnp
d=jax.devices()
n=int(131+100*random.random())
x=jnp.ones((n,257)); y=(x@x.T).sum(); y.block_until_ready()
print('OK', d[0].platform, 'probe_s=%.1f'%(time.time()-t0))
" 2>&1 | tail -1)
  echo "$(date +%H:%M:%S) $out" >> /tmp/tpu_status.txt
  case "$out" in OK\ tpu*) echo "$(date +%H:%M:%S) TPU UP" >> /tmp/tpu_status.txt; exit 0;; esac
  sleep 900
done
