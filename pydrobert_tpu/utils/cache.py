"""Platform-aware persistent-compilation-cache location.

The XLA:CPU backend caches ahead-of-time-compiled executables keyed only by
the program, not by the machine that compiled it. When the same cache
directory is reused from a host with a different CPU (common here: the repo —
cache included — moves between build hosts), every load logs a loud
machine-feature-mismatch error and risks SIGILL from unsupported
instructions. CPU caches are therefore keyed by a fingerprint of the host's
CPU features. TPU executables have no host-CPU dependence — keying them by
host would just cold-start every benchmark run after a host swap (it cost
this repo a full bench window in round 3) — so accelerator-platform
processes share one un-fingerprinted directory.
"""

import hashlib
import os
import platform

__all__ = ["host_fingerprint", "compilation_cache_dir", "enable_cache"]


def _platform_tag() -> str:
    """"cpu" when this process is pinned to the CPU backend (env var or
    jax config, as tests/conftest.py and the multichip dryrun do), else
    "tpu" (the default platform here is the accelerator tunnel). Checked
    WITHOUT initializing a backend: enable_cache runs before first device
    contact and must not hang on a dead tunnel."""
    try:
        import jax

        conf = getattr(jax.config, "jax_platforms", None)
    except Exception:  # pragma: no cover
        conf = None
    plats = [
        p.strip()
        for p in str(conf or os.environ.get("JAX_PLATFORMS", "")).split(",")
        if p.strip()
    ]
    # only the PRIMARY platform decides: the axon tunnel registers itself
    # as "axon,cpu" (cpu as fallback), which must still key as tpu
    return "cpu" if plats and plats[0] == "cpu" else "tpu"


def host_fingerprint() -> str:
    """A short stable id for this machine's CPU microarchitecture.

    Hashes the instruction-set flags AND the family/model/stepping lines:
    two build hosts here exposed identical cpuinfo *flags* yet different
    LLVM-detected models, so XLA:CPU compiled with model-derived tuning
    features (``+prefer-no-scatter``/``+prefer-no-gather``) one host lacks
    — flags alone collided and the AOT loader logged feature mismatches.
    """
    feats = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats.append(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                    )
                    break
                if line.startswith(("cpu family", "model", "stepping")):
                    feats.append(line.strip())
    except OSError:
        pass
    raw = f"{platform.machine()}|{'|'.join(feats)}"
    return hashlib.sha1(raw.encode()).hexdigest()[:10]


def compilation_cache_dir(base: str) -> str:
    """The cache directory for this process: ``<base>-tpu`` (shared across
    hosts) for accelerator processes, ``<base>-<host fingerprint>`` for
    CPU-pinned ones (XLA:CPU AOT entries are host-CPU-specific)."""
    tag = _platform_tag()
    if tag == "tpu":
        return f"{base.rstrip(os.sep)}-tpu"
    return f"{base.rstrip(os.sep)}-{host_fingerprint()}"


def enable_cache(base: str) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir.

    Returns the directory used. ``base`` is the un-fingerprinted prefix,
    e.g. ``/repo/.cache/jax``.
    """
    import jax

    # explicit override: processes whose OUTPUT is a driver-facing artifact
    # (the multichip dryrun) point here at a fresh temp dir — XLA:CPU AOT
    # entries log a wall of machine-feature-mismatch errors on every LOAD
    # (even same-host ones; the compile embeds LLVM tuning flags like
    # +prefer-no-gather that the loader then compares against raw cpuinfo),
    # and a fresh dir has nothing to load
    d = os.environ.get("PDT_CACHE_DIR") or compilation_cache_dir(base)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        # keep JAX's own executable cache but disable XLA-internal
        # sub-caches: XLA:CPU's AOT entries embed model-derived tuning
        # features (+prefer-no-gather/-scatter) its loader then rejects as
        # "unsupported on the host machine" EVEN ON THE HOST THAT WROTE
        # THEM — every reload logs a wall of cpu_aot_loader errors and
        # recompiles anyway
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # pragma: no cover - older jax without the knob
        pass
    return d
