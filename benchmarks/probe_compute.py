"""Probe that the TPU tunnel can actually COMPUTE, not just enumerate devices.

``jax.devices()`` answers from cached topology even while the compute path is
hung, so the watcher must run a real (tiny) jitted program and fetch the
result. Exits 0 iff a matmul round-trips within the timeout set by the caller.
"""
import sys
import time

t0 = time.time()
import jax
import jax.numpy as jnp

d = jax.devices()[0]
x = jnp.ones((256, 256), jnp.float32)
y = jax.jit(lambda a: (a @ a).sum())(x)
val = float(y)
dt = time.time() - t0
print(f"compute-ok platform={d.platform} kind={d.device_kind} val={val} dt={dt:.1f}s")
sys.exit(0 if val == 256.0 * 256 * 256 else 1)
