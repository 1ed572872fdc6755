"""tfhe_aes2_tpu — a TPU-native TFHE framework evaluating AES-128 homomorphically.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Rust crate `tfhe-aes` (allanbrondum/tfhe-aes-2): WoP-PBS based TFHE (bit
extraction, circuit bootstrapping, vertical-packing CMux-tree lookup) driving
a fully homomorphic AES-128-CTR keystream, bit-exact against FIPS-197.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  ops/     — L0 crypto primitive layer (the tfhe-rs surface, rebuilt as
             struct-of-array tensor kernels: LWE/GLWE/GGSW, negacyclic
             polynomial arithmetic on the MXU, blind rotation, keyswitching,
             circuit bootstrapping, vertical packing).
  models/  — L1 FHE models (shortint_woppbs_1bit et al.): key material,
             bit encoding, parameter sets, noise accounting.
  aes_128/ — L2-L4 AES-128 layer: bit-sliced data model, the two round
             pipelines (sbox_pbs / sbox_gal_mul_pbs), clear oracles,
             client-side FHE encryption.
  parallel/— mesh/shard_map scale-out of the block batch and PBS batch.

64-bit torus elements are represented as jnp.uint64 (requires jax x64 mode,
enabled at import). All O(N^2) compute is lowered to int8 limb-plane matmuls
with int32 accumulation so the hot path runs on the TPU MXU exactly.
"""

import os

# Raise the TPU scoped-VMEM (kernel stack) limit from the 16MB default: the
# blind-rotate kernels batch-tile their VMEM scratch, and larger tiles
# amortize the per-tile negacirculant builds (measured dominant at the
# default limit). v5e has 128MB physical VMEM. Goes through LIBTPU_INIT_ARGS
# (not XLA_FLAGS: the CPU XLA plugin fatally rejects TPU-only flags). Must be
# set before the TPU backend initializes; respects a user-provided value.
_FLAGS = os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _FLAGS:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _FLAGS + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import jax  # noqa: E402

# 64-bit torus arithmetic requires x64 mode. Must happen before any tracing.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the production AES program costs ~9 minutes
# of XLA/Mosaic compilation on a fresh process (BENCH_r01.json tail); with
# the cache warm the same programs deserialize in seconds. Default location
# is next to the package so bench.py / cli.py / tests all share it;
# TFHE_JAX_CACHE overrides (set to "0" to disable, e.g. for compile-time
# measurements).
#
# The default dir is suffixed with a fingerprint of this host's CPU feature
# flags: XLA:CPU cache entries are AOT executables compiled for the exact
# machine features of the compiling host, and jax's cache key does NOT
# include them — loading another machine's entries triggers cpu_aot_loader
# "could lead to execution errors such as SIGILL" warnings (seen when the
# driver host deserialized the bench host's executables, MULTICHIP_r03).
# TPU entries only ever compile on the tunnel host, so the split costs
# nothing there. An explicit TFHE_JAX_CACHE is used verbatim.


def _machine_tag() -> str:
    # hash model name + flags, not flags alone: XLA:CPU AOT results embed
    # model-dependent TUNING features (e.g. +prefer-no-gather) that two VMs
    # with identical flags lines can disagree on — a flags-only tag let one
    # machine deserialize another's entries and warn about SIGILL risk
    # (MULTICHIP_r04 tail; VERDICT r4 weak #1)
    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name", "model\t",
                                    "vendor_id")):
                    lines.append(line)
                if len(lines) >= 4:
                    break
        if lines:
            import hashlib
            return hashlib.sha1("".join(lines).encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


_CACHE = os.environ.get(
    "TFHE_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 ".jax_cache-" + _machine_tag()))
if _CACHE != "0":
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# numpy madvises MADV_HUGEPAGE on every allocation >=4MB, and THP first-touch
# faults on this host cost ~500us/page vs ~2us for plain 4KB pages — measured
# 10.9s vs 0.03s to fault in one fresh 80MB buffer (320x). Keygen alone
# allocates ~1.5GB of fresh numpy buffers, so this single switch took keygen
# from ~98s to ~12s. Runtime toggle (not NUMPY_MADVISE_HUGEPAGE): numpy is
# usually already imported via jax by the time this package loads.
try:  # numpy >= 2.0
    from numpy._core import multiarray as _np_ma  # noqa: E402
except ImportError:  # numpy 1.x
    from numpy.core import multiarray as _np_ma  # noqa: E402
if hasattr(_np_ma, "_set_madvise_hugepage"):
    _np_ma._set_madvise_hugepage(False)

__version__ = "0.1.0"
