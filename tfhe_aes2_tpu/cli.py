"""CLI mirroring the reference binary (src/bin/main.rs:29-39).

    python -m tfhe_aes2_tpu.cli --key <hex16> --iv <hex8> --number-of-outputs N
        [--implementation shortint-woppbs-1bit] [--seed S]
"""

from __future__ import annotations

import argparse
import logging
import sys


def param_choices():
    """--params name -> parameter set (1-bit model). Module-level so tests
    can pin the dispatch (every production set is executed by
    tests/test_params_all_sets.py; this maps the CLI names onto them)."""
    from tfhe_aes2_tpu.ops import params as params_mod

    return {"lvl1": params_mod.PARAMS_SQRD_LVL_1,
            "lvl4": params_mod.PARAMS_SQRD_LVL_4,
            "lvl64": params_mod.PARAMS_SQRD_LVL_64,
            "lvl256": params_mod.PARAMS_SQRD_LVL_256,
            "test": params_mod.PARAMS_TEST,
            "test-n256": params_mod.PARAMS_TEST_N256}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tfhe_aes2_tpu")
    ap.add_argument("--number-of-outputs", type=int, required=True)
    ap.add_argument("--iv", type=str, required=True, help="8-byte hex IV")
    ap.add_argument("--key", type=str, required=True, help="16-byte hex AES key")
    ap.add_argument("--implementation", type=str, default="shortint-woppbs-1bit",
                    choices=["shortint-woppbs-1bit", "shortint-woppbs-8bit",
                             "shortint-1bit"])
    ap.add_argument("--seed", type=int, default=0, help="key generation seed")
    ap.add_argument("--log-level", type=str, default="INFO")
    ap.add_argument("--params", type=str, default="lvl64",
                    choices=["lvl1", "lvl4", "lvl64", "lvl256", "test",
                             "test-n256"],
                    help="parameter set for the 1-bit model (dev flag, not in "
                         "the reference CLI; 'test' sets are INSECURE and for "
                         "fast CPU runs only)")
    ap.add_argument("--rounds", type=int, default=10,
                    help="AES rounds (dev flag; <10 verifies against the "
                         "partial-round plain oracle)")
    ap.add_argument("--compress-output", type=int, default=None,
                    choices=[16, 32],
                    help="compress the server response to small-key cts at "
                         "modulus 2^N before transport (~12x/6x smaller; "
                         "woppbs-1bit only — ops/compression.py)")
    ap.add_argument("--fhe-counter", action="store_true",
                    help="upload only the first encrypted iv‖ctr block; the "
                         "server derives the rest by homomorphic counter "
                         "increments (woppbs-1bit only — aes_128/ctr_fhe.py)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=args.log_level,
                        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    print(f"using implementation: {args.implementation}")

    key = bytes.fromhex(args.key)
    iv = bytes.fromhex(args.iv)
    if len(key) != 16:
        ap.error("invalid key length, must be 16 bytes")
    if len(iv) != 8:
        ap.error("invalid iv length, must be 8 bytes")

    if (args.compress_output is not None
            and args.implementation != "shortint-woppbs-1bit"):
        ap.error("--compress-output needs the shortint-woppbs-1bit model "
                 "(big-key output bits)")
    if args.fhe_counter and args.implementation != "shortint-woppbs-1bit":
        ap.error("--fhe-counter needs the shortint-woppbs-1bit model (the "
                 "increment adder runs on its circuit bootstrap)")

    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod
    from tfhe_aes2_tpu.aes_128.scenario import run_client_server_aes_scenario

    if args.implementation == "shortint-woppbs-1bit":
        from tfhe_aes2_tpu.models import shortint_woppbs_1bit as model
        pset = param_choices()[args.params]
        strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt
        # AOT warm-up BEFORE keygen: programs load from the local artifact
        # store (aot_cache/, auto-refreshed by bench.py) or compile on
        # background threads, concurrently with key generation/transfer, and
        # the tunneled device's per-process execute-channel constant is
        # absorbed early (tfhe_aes2_tpu/aot.py). A single-output full-rounds
        # run takes the fused latency path (scenario.py), so warm its
        # programs instead of the unused 1-block round programs.
        handle = None
        import os as _os
        aot_env = _os.environ.get("TFHE_AOT", "")
        import jax as _jax
        if aot_env == "1" or (aot_env != "0"
                              and _jax.default_backend() != "cpu"):
            from tfhe_aes2_tpu import aot
            handle = aot.warmup_staged(strategy, pset,
                                       args.number_of_outputs, args.rounds,
                                       args.compress_output or 0,
                                       latency=(args.number_of_outputs == 1
                                                and args.rounds == 10
                                                and not args.fhe_counter))
        print(f"generating keys ({args.params})...")
        client, ctx = model.generate_keys(pset, seed=args.seed)
        if handle is not None:
            handle.attach(ctx)
    elif args.implementation == "shortint-woppbs-8bit":
        from tfhe_aes2_tpu.models import shortint_woppbs_8bit as model
        print("generating keys (woppbs 8bit)...")
        client, ctx = model.generate_keys(seed=args.seed)
        strategy = fhe_mod.ShortintWoppbs8BitSboxPbsAesEncrypt
    else:
        # Dispatched like the reference binary (main.rs:60-92). NOTE: the
        # reference flags this model's parameters `!Testing parameters!`
        # (shortint_1bit.rs:62) and #[ignore]s its AES tests for noise
        # accumulation — expect the final verification to fail at 10 rounds.
        from tfhe_aes2_tpu.models import shortint_1bit as model
        pset = (model.PARAMS_TEST_S1 if args.params.startswith("test")
                else model.PARAMS_SHORTINT_1BIT)
        pname = "test-s1" if args.params.startswith("test") else "shortint-1bit"
        print(f"generating keys ({pname})...")
        client, ctx = model.generate_keys(pset, seed=args.seed)
        strategy = fhe_mod.Shortint1BitSboxPbsAesEncrypt

    run_client_server_aes_scenario(client, ctx, key, iv, args.number_of_outputs,
                                   strategy=strategy, rounds=args.rounds,
                                   compress_log2q=args.compress_output,
                                   fhe_counter=args.fhe_counter)
    oracle = ("AES authority" if args.rounds == 10
              else f"plain {args.rounds}-round oracle")
    print(f"ok: FHE keystream verified against {oracle}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
