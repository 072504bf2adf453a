# -*- coding: utf-8 -*-
"""Platform plumbing: the local-CPU-backend hooks that keep budget-only
device programs off the accelerator tunnel (hostinfo.ensure_cpu_platform
/ local_cpu_device, wired from tpukit/__init__ and the CLI)."""
import os
import subprocess
import sys

import jax


def test_bare_import_stays_jax_free():
    """`import tpukit` in a process that has NOT imported jax must not
    pull it in (CLI --help and io/viz-only consumers stay fast). -S
    skips site/sitecustomize, so the axon boot hook's eager jax import
    is absent like on a vanilla machine."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {repo!r}); import tpukit; "
            "assert 'jax' not in sys.modules, 'tpukit import pulled jax'; "
            "print('LAZY-OK')")
    r = subprocess.run([sys.executable, "-S", "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "LAZY-OK" in r.stdout


def test_local_cpu_device_available_and_idempotent():
    """local_cpu_device self-heals (re-runs ensure_cpu_platform) and
    returns a CPU device under the suite's cpu pin; repeated calls are
    stable."""
    from tpukit.hostinfo import ensure_cpu_platform, local_cpu_device

    d1 = local_cpu_device()
    ensure_cpu_platform()          # idempotent, config-only
    d2 = local_cpu_device()
    assert d1 is not None and d1.platform == "cpu"
    assert d2 == d1
    # the suite's platform pin survives untouched (cpu stays first /
    # default)
    assert jax.config.jax_platforms.split(",")[0] == "cpu"
    assert jax.default_backend() == "cpu"
