"""Probe that the TPU tunnel can actually COMPUTE, not just enumerate devices.

``jax.devices()`` answers from cached topology even while the compute path is
hung, so the watcher must run a real (tiny) jitted program and fetch the
result. The matmul runs on EVERY local device (a hang isolated to one chip or
the transfer path of a multi-chip host would otherwise still report
compute-ok). Exits 0 iff each device's matmul round-trips within the timeout
set by the caller.
"""
import sys
import time

t0 = time.time()
import jax
import jax.numpy as jnp

devs = jax.local_devices()
x = jnp.ones((256, 256), jnp.float32)
ok = True
for d in devs:
    y = jax.jit(lambda a: (a @ a).sum(), device=d)(jax.device_put(x, d))
    val = float(y)
    ok = ok and val == 256.0 * 256 * 256
dt = time.time() - t0
print(
    f"compute-ok platform={devs[0].platform} kind={devs[0].device_kind} "
    f"devices={len(devs)} ok={ok} dt={dt:.1f}s"
)
sys.exit(0 if ok else 1)
