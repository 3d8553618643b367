"""Host-keyed persistent-compilation-cache location.

The XLA:CPU backend caches ahead-of-time-compiled executables keyed only by
the program, not by the machine that compiled it. When the same cache
directory is reused from a host with a different CPU (common here: the repo —
cache included — moves between build hosts), every load logs a loud
machine-feature-mismatch error and risks SIGILL from unsupported
instructions. Keying the directory by a fingerprint of the host's CPU
features keeps caches warm per host while making cross-host reuse
impossible.
"""

import hashlib
import os
import platform

__all__ = ["host_fingerprint", "compilation_cache_dir", "enable_cache"]


def host_fingerprint() -> str:
    """A short stable id for this machine's instruction-set features."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha1(raw.encode()).hexdigest()[:10]


def compilation_cache_dir(base: str) -> str:
    """``<base>-<host fingerprint>``: a per-host cache directory path."""
    return f"{base.rstrip(os.sep)}-{host_fingerprint()}"


def enable_cache(base: str) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir.

    Returns the directory used. ``base`` is the un-fingerprinted prefix,
    e.g. ``/repo/.cache/jax``.
    """
    import jax

    d = compilation_cache_dir(base)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
