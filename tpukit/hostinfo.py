# -*- coding: utf-8 -*-
"""Host fingerprinting for persistent-compile-cache safety.

The bench/CI hosts here are migratable VMs whose visible CPU features can
change between boots. XLA:CPU caches AOT executables compiled with
`-march`-style feature lists; loading an entry produced under a different
feature set logs "Machine type used for XLA:CPU compilation doesn't match
the machine type for execution ... could lead to execution errors such as
SIGILL" — and has produced real segfaults on this box. Keying every cache
directory by a fingerprint of the visible CPU features makes stale
entries unreachable after a migration instead of loadable-and-fatal.
"""

from __future__ import annotations

import hashlib


def cpu_feature_fingerprint() -> str:
    """Short stable hash of the CPU feature set visible to this boot
    (x86 'flags', aarch64 'Features', ppc 'cpu'/'model' lines — the first
    matching key of the first core)."""
    prio = {"flags": 0, "features": 1, "cpu": 2, "model name": 3}
    best = None          # (priority, normalized value)
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                p = prio.get(key)
                if p is not None and (best is None or p < best[0]):
                    best = (p, " ".join(sorted(set(line.split(":", 1)[1]
                                                   .split()))))
                    if p == 0:
                        break
    except OSError:
        pass
    if best is None:
        import platform
        best = (9, f"{platform.machine()} {platform.processor()}")
    return hashlib.sha256(best[1].encode()).hexdigest()[:12]


def ensure_cpu_platform() -> None:
    """Make the local CPU platform available ALONGSIDE an explicitly
    pinned accelerator platform (e.g. JAX_PLATFORMS=axon on tunneled TPU
    attachments). Must run before the first backend initialization.

    Why: budget-only computations (the ebcot quality→size pricing) run on
    the local CPU backend so they are deterministic across device
    topologies AND immune to tunnel pathologies (first-use executable
    shipping to a remote server has been measured at 40–120 s on degraded
    attachments; the CPU load is a local disk read). The default backend
    is unchanged — the first platform in the list keeps priority."""
    import os

    import jax

    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS") or "")
    if plats and "cpu" not in plats.split(","):
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass        # backends already initialized; leave as is


def local_cpu_device():
    """The first local CPU device, or None when the CPU platform is
    unavailable (backends initialized before any ensure_cpu_platform
    call, exotic builds). Self-healing: re-runs ensure_cpu_platform
    first (idempotent, config-only) so callers in processes that
    imported jax after tpukit still get the local platform."""
    import jax

    ensure_cpu_platform()
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def configure_jax_compile_cache(root: str) -> str:
    """Point jax's persistent compile cache at ``root/<fingerprint>`` with
    no size/time thresholds. One shared implementation for the CLI, the
    bench, and the test session — on migratable VMs, AOT entries from a
    different boot's CPU feature set can SIGILL when loaded, so the
    fingerprint keeps them unreachable."""
    import os

    import jax

    ensure_cpu_platform()
    d = os.path.join(root, cpu_feature_fingerprint())
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    return d
