"""Key serialization (save/load of client + evaluation keys).

The reference has no checkpointing (keys are regenerated every run —
SURVEY.md §5); for a deployed service the evaluation keys must ship from the
client to the TPU hosts once and be reloadable, so this framework adds a
compact npz format. Client keys embed the RNG state so encryption remains
reproducible after a round trip.
"""

from __future__ import annotations

import json

import numpy as np

from tfhe_aes2_tpu.ops.keys import ClientKey, ServerKeySet
from tfhe_aes2_tpu.ops.params import WopbsParams


def save_server_keys(path: str, sks: ServerKeySet, params: WopbsParams) -> None:
    np.savez_compressed(
        path,
        bsk=np.asarray(sks.bsk), ksk=np.asarray(sks.ksk),
        pfpksk=np.asarray(sks.pfpksk), pksk=np.asarray(sks.pksk),
        params=np.frombuffer(
            json.dumps(params.__dict__).encode(), dtype=np.uint8))


def load_server_keys(path: str) -> tuple[ServerKeySet, WopbsParams]:
    with np.load(path) as z:
        params = WopbsParams(**json.loads(bytes(z["params"]).decode()))
        sks = ServerKeySet(bsk=z["bsk"], ksk=z["ksk"], pfpksk=z["pfpksk"],
                           pksk=z["pksk"])
    return sks, params


def save_client_key(path: str, client: ClientKey) -> None:
    state = client.rng.bit_generator.state
    np.savez_compressed(
        path,
        lwe_sk=client.lwe_sk, glwe_sk=client.glwe_sk,
        params=np.frombuffer(
            json.dumps(client.params.__dict__).encode(), dtype=np.uint8),
        rng_state=np.frombuffer(json.dumps(state).encode(), dtype=np.uint8))


def load_client_key(path: str) -> ClientKey:
    with np.load(path) as z:
        params = WopbsParams(**json.loads(bytes(z["params"]).decode()))
        rng = np.random.default_rng()
        rng.bit_generator.state = json.loads(bytes(z["rng_state"]).decode())
        return ClientKey(params=params, lwe_sk=z["lwe_sk"],
                         glwe_sk=z["glwe_sk"], rng=rng)
