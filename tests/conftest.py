"""Test harness config (SURVEY.md §4.5).

Tests run on a faked 2-device CPU mesh so the DP/sharding path is exercised
without a pod: env vars must be set before jax initializes.
"""

import os
import sys

# 2 faked devices, not 8: the host threadpool is split per virtual
# device, so every single-device program in the suite runs at 1/N of the
# machine — N=2 keeps the full DP/sharding path exercised (collectives,
# shard placement, equivalence) at 4x the throughput of N=8. The driver's
# dryrun_multichip covers the 8-way topology separately.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's TPU plugin ("axon") prepends itself to JAX_PLATFORMS, so
# the env var alone cannot select CPU; the config update can (it must happen
# before the backend initializes, i.e. before any jax array op).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite jit-compiles many programs on the
# faked 2-device CPU mesh; caching them makes reruns minutes faster.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
