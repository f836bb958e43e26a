"""Test configuration: CPU backend with 8 virtual devices for sharding tests.

The axon sitecustomize registers the real-TPU backend at interpreter start —
*before* this file runs — so setting JAX_PLATFORMS/XLA_FLAGS here is too
late: the suite would silently run over the TPU tunnel (slow) and the
multi-device sharding tests would skip for lack of devices.  When that
environment is detected, re-exec pytest in a clean child where the 8-device
CPU mesh can actually be built (same pattern as
__graft_entry__.dryrun_multichip).
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compile cache, READ-ONLY on CPU: the suite's cost is
# dominated by CPU compiles of the jitted pipeline variants, and cache
# hits on previously-written entries make repeat runs start warm.  Cache
# WRITES are suppressed (min-compile-time beyond reach) because the CPU
# backend intermittently SEGFAULTS while serializing large executables
# (observed in jax compilation_cache.put_executable_and_time for both
# shard_map and donated pipeline steps).  The dir is keyed by a host-CPU
# feature hash: XLA:CPU AOT entries embed the compile machine's feature
# set, and loading them on a different host spews cpu_aot_loader errors
# and risks SIGILL (observed in the round-3 driver dryrun).
import hashlib  # noqa: E402

import jax  # noqa: E402


def _host_cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_COMPILE_CACHE", "/root/.jaxcache_tests")
    + "_" + _host_cpu_tag(),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
