"""Client/server AES-CTR scenario driver (reference main.rs:97-159).

Per block the plaintext is IV(8 bytes) ‖ big-endian counter(8 bytes), counter
starting at 1 (main.rs:108-115). The client FHE-encrypts key and counter
blocks; the server (TPU) expands the key and runs all rounds under FHE in one
compiled program; the client decrypts and the result is asserted against the
independent AES authority (main.rs:123-127).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.aes_128 import aes_lib, fhe as fhe_mod, fhe_encryption
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext
from tfhe_aes2_tpu.ops.keys import ClientKey

log = logging.getLogger("tfhe_aes2_tpu")


def ctr_blocks(iv: bytes, count: int) -> list[bytes]:
    """iv ‖ counter blocks, counter = 1..count (main.rs:108-115)."""
    assert len(iv) == 8
    return [iv + int(c).to_bytes(8, "big") for c in range(1, count + 1)]


def run_client_server_aes_scenario(client: ClientKey, ctx: FheContext,
                                   key_clear: bytes, iv: bytes,
                                   block_count: int,
                                   strategy=fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt,
                                   verify: bool = True, rounds: int = 10,
                                   compress_log2q: int | None = None,
                                   fhe_counter: bool = False):
    """Returns (decrypted blocks, timings dict).

    rounds < 10 is a development mode (not in the reference CLI): the result
    is verified against the first-party partial-round plain oracle instead of
    the AES authority (test_helper.rs uses the same oracle split).

    compress_log2q (16 or 32, woppbs_1bit strategies only): the server
    keyswitches the output bits to the small key and modulus-switches to
    q' = 2^log2q before transport — a ~12x / ~6x smaller response than the
    raw big-key ciphertexts (ops/compression.py; beyond the reference, whose
    client/server split is in-process so transfer is free).

    fhe_counter (woppbs_1bit strategies only): the client uploads only the
    FIRST encrypted iv‖ctr block; the server derives the remaining
    block_count-1 blocks by homomorphic counter increments (aes_128/ctr_fhe)
    before running AES. The reference keeps the counter client-side
    (main.rs:108-115) and has the increment adder only in tests
    (shortint_woppbs_1bit.rs:833-877).
    """
    if fhe_counter and not isinstance(ctx, FheContext):
        raise ValueError("--fhe-counter needs a shortint_woppbs_1bit context "
                         "(the homomorphic increment adder runs on its "
                         "circuit bootstrap)")
    # Client side: FHE encrypt AES key and CTR blocks
    key_ct = strategy.encrypt_key_client(client, key_clear)
    blocks_clear = ctr_blocks(iv, block_count)
    block_cts = strategy.encrypt_client(
        client, blocks_clear[:1] if fhe_counter else blocks_clear)
    log.info("aes key and blocks fhe encrypted")

    # Single fresh-key output: the fused-scan latency path runs key
    # expansion AND all rounds in 11 shared blind rotations — ~1.4x lower
    # end-to-end latency than expand-then-rounds (PERF.md r5; the reference
    # necessarily serializes the two, main.rs:119-120)
    if (block_count == 1 and rounds == 10 and not fhe_counter
            and isinstance(ctx, FheContext)
            and hasattr(strategy.pipeline, "latency_fused_middle")):
        t0 = time.time()
        out = fhe_mod.encrypt_block_latency(strategy, ctx,
                                            jnp.asarray(key_ct),
                                            jnp.asarray(block_cts))
        out.array.block_until_ready()
        t_blocks = time.time() - t0
        out = out.array
        print(f"AES key expansion + #1 output computed in: {t_blocks:.3f}s "
              "(fused latency path)")
        # the fused path has no expansion/rounds split — report it under its
        # own key; key_expansion_s/blocks_per_s stay None rather than
        # acquiring a different meaning than the batch path's fields
        return _verify_and_return(client, ctx, strategy, out, key_clear,
                                  blocks_clear, rounds, compress_log2q,
                                  verify,
                                  {"fused_latency_s": t_blocks,
                                   "key_expansion_s": None,
                                   "blocks_s": t_blocks,
                                   "blocks_per_s": None,
                                   "ctr_derive_s": 0.0})

    # Server side: key expansion (timed separately, main.rs:130-139)
    t0 = time.time()
    eks = fhe_mod.key_schedule_staged(strategy, ctx, jnp.asarray(key_ct))
    eks.array.block_until_ready()
    t_expand = time.time() - t0
    print(f"AES key expansion took: {t_expand:.3f}s")

    # Server side: derive the CTR keystream homomorphically (fhe_counter)
    blocks_arr = jnp.asarray(block_cts)
    blocks_meta = None
    t_derive = 0.0
    if fhe_counter:
        from tfhe_aes2_tpu.aes_128 import ctr_fhe
        t0 = time.time()
        block0 = blocks_arr[0]
        blocks_arr = ctr_fhe.derive_ctr_blocks_staged(ctx, block0, block_count)
        blocks_arr.block_until_ready()
        t_derive = time.time() - t0
        # derived blocks are NOT fresh (adder-bootstrap noise on the counter
        # bits); thread their true conservative metadata into the rounds
        blocks_meta = ctr_fhe.derived_blocks_meta(ctx, block0, block_count)
        print(f"CTR keystream of #{block_count} blocks derived "
              f"homomorphically in: {t_derive:.3f}s")

    # Server side: block encryption (main.rs:141-159)
    t0 = time.time()
    out = fhe_mod.encrypt_blocks_staged(strategy, ctx, eks,
                                        blocks_arr, rounds,
                                        blocks_meta=blocks_meta)
    out.array.block_until_ready()
    t_blocks = time.time() - t0
    out = out.array
    print(f"AES of #{block_count} outputs computed in: {t_blocks:.3f}s "
          f"({block_count / t_blocks:.4f} blocks/s)")

    return _verify_and_return(client, ctx, strategy, out, key_clear,
                              blocks_clear, rounds, compress_log2q, verify,
                              {"key_expansion_s": t_expand,
                               "blocks_s": t_blocks,
                               "blocks_per_s": block_count / t_blocks,
                               "ctr_derive_s": t_derive})


def _verify_and_return(client, ctx, strategy, out, key_clear, blocks_clear,
                       rounds, compress_log2q, verify, timings):
    """Client side: (optionally compressed) decrypt + verification against
    the independent AES authority / partial-round plain oracle."""
    if compress_log2q is not None:
        from tfhe_aes2_tpu.ops import compression
        comp = jax.jit(compression.compress_bits,
                       static_argnames=("params", "log2q"))(
            out, ctx.sks, params=ctx.params, log2q=compress_log2q)
        blob = compression.pack_bytes(np.asarray(comp), compress_log2q)
        raw = int(np.asarray(out).nbytes)
        print(f"compressed response: {len(blob)} bytes "
              f"({raw / len(blob):.1f}x smaller than big-key cts)")
        comp_arr = compression.unpack_bytes(blob, np.asarray(comp).shape,
                                            compress_log2q)
        decrypted = compression.decrypt_blocks_compressed(
            client, comp_arr, compress_log2q)
    else:
        decrypted = strategy.decrypt_client(client, np.asarray(out))
    if verify:
        if rounds == 10:
            expect = aes_lib.encrypt_blocks(key_clear, blocks_clear)
            oracle = "AES authority"
        else:
            from tfhe_aes2_tpu.aes_128 import plain
            expect = plain.expand_key_and_encrypt_blocks(
                key_clear, blocks_clear, rounds)
            oracle = f"plain {rounds}-round oracle"
        assert decrypted == expect, f"FHE AES output mismatch vs {oracle}"
    return decrypted, timings
