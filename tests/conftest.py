"""Test harness: force an 8-device virtual CPU mesh (the TPU-native answer to
"multi-node without a cluster" — SURVEY.md §4).

Some pytest plugins import jax before this conftest runs, so setting env vars
is not enough; `jax.config.update` works as long as no backend has been
initialized yet (none is at collection time).
"""

import os

# Belt: env for any subprocesses.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Suspenders: the in-process config, effective even if jax was pre-imported.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the fast loop is compile-bound on this 1-core
# box, and CPU-side XLA compiles DO hit this cache (unlike tunnel-side TPU
# compiles).  Repeat suite runs skip every previously-seen jit shape.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
