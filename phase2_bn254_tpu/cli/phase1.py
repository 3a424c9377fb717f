"""Phase-1 ceremony command-line tools.

Byte-compatible reimplementations of the six powersoftau binaries
(/root/reference/powersoftau/src/bin/): new_constrained, compute_constrained,
beacon_constrained, verify_transform_constrained (reduce_powers and
prepare_phase2 arrive with the NTT stack).

The ceremony "API" is files on disk: challenge/response with a 64-byte
Blake2b hash-chain header.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

from ..ceremony import accumulator
from ..ceremony.keypair import PublicKey, keypair
from ..ceremony.params import HASH_SIZE, CeremonyParams
from ..crypto.chacha import ChaChaRng
from ..crypto.hashing import calculate_hash, pretty_hash


def _default_backend():
    """JAX backend if available, exact host backend otherwise.

    `PHASE2_TPU_BACKEND=exact|jax|sharded` overrides the choice (the framework's
    env-var config surface, like the reference's `BELLMAN_VERBOSE` —
    /root/reference/bellman/src/lib.rs:52-54). `exact` is the right choice
    for small CPU-only runs, where XLA compiles dominate wall clock.
    """
    choice = os.environ.get("PHASE2_TPU_BACKEND", "").lower()
    if choice == "exact":
        from ..refimpl.backend import ExactBackend

        return ExactBackend()
    if os.environ.get("PHASE2_TPU_COORDINATOR") or os.environ.get(
        "PHASE2_TPU_AUTO_DISTRIBUTED"
    ):
        # multi-host: join the process group, shard over the global mesh
        from ..parallel import multihost
        from ..parallel.backend import ShardedBackend

        multihost.init_distributed()
        return ShardedBackend(mesh=multihost.global_mesh())
    if choice == "sharded":
        from ..parallel.backend import ShardedBackend

        return ShardedBackend()
    try:
        import jax

        if choice != "jax" and len(jax.devices()) > 1 and jax.default_backend() != "cpu":
            # multi-chip TPU: shard the ceremony over the mesh by default
            from ..parallel.backend import ShardedBackend

            return ShardedBackend()
        from ..ops.backend import JaxBackend

        return JaxBackend()
    except Exception as e:  # pragma: no cover
        if choice == "jax":
            raise
        print(f"warning: JAX backend unavailable ({e}); using exact host backend")
        from ..refimpl.backend import ExactBackend

        return ExactBackend()


def participant_rng(entropy: str, system_entropy: bytes | None = None) -> ChaChaRng:
    """compute_constrained.rs:41-80: Blake2b(1024 OsRng bytes || user text),
    first 32 digest bytes as 8 BE u32 seed words."""
    if system_entropy is None:
        system_entropy = os.urandom(1024)
    assert len(system_entropy) == 1024
    h = hashlib.blake2b()
    h.update(system_entropy)
    h.update(entropy.encode())
    return ChaChaRng.from_digest_be(_shared_seed_digest(h.digest()))


def _multihost_env() -> bool:
    return bool(
        os.environ.get("PHASE2_TPU_COORDINATOR")
        or os.environ.get("PHASE2_TPU_AUTO_DISTRIBUTED")
    )


def _shared_seed_digest(digest: bytes) -> bytes:
    """Multi-host contribute: all processes must derive the SAME keypair
    (the collectives compute one participant's tau powers), so the
    coordinator's FINAL Blake2b seed digest is broadcast to the process
    group - one participant == one pod, a single trust domain. Broadcasting
    the digest (not just the OS entropy) also covers the user-text entropy,
    which can differ per process (interactive stdin / per-process --entropy).
    Single-process (no multihost env config): identity, no JAX touched."""
    if not _multihost_env():
        return digest
    from ..parallel import multihost

    multihost.init_distributed()
    import jax

    if jax.process_count() == 1:
        return digest
    import numpy as np
    from jax.experimental import multihost_utils

    mine = np.frombuffer(digest, dtype=np.uint8)
    shared = multihost_utils.broadcast_one_to_all(mine)
    return bytes(np.asarray(shared))


def beacon_rng(beacon_hash_hex: str, iterations_exp: int, progress: bool = True) -> ChaChaRng:
    """beacon_constrained.rs:51-97: 2^n iterated SHA-256 over the beacon."""
    cur = bytes.fromhex(beacon_hash_hex)
    assert len(cur) == 32
    n = iterations_exp
    for i in range(1 << n):
        if progress and n >= 10 and i % (1 << (n - 10)) == 0:
            print(f"{i}: {cur.hex()}")
        cur = hashlib.sha256(cur).digest()
    print(f"Final result of beacon: {cur.hex()}")
    return ChaChaRng.from_digest_be(cur)


def _out_path(path: str) -> str:
    """Multi-host runs: every process executes the same program (collectives
    must stay aligned) and produces the same bytes, but only the coordinator
    owns the REAL output file; other processes write to per-process scratch
    (removed by _finish_out). Single-process: identity.

    Gated on the multihost env config rather than a broad try/except around
    jax.process_count(): a swallowed error in a partially initialized
    distributed state would silently send every process to the SAME real
    path, corrupting the output file (ADVICE r3)."""
    if not _multihost_env():
        return path
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        return f"{path}.proc{jax.process_index()}.scratch"
    return path


def _finish_out(real_path: str, used_path: str) -> None:
    if used_path != real_path and os.path.exists(used_path):
        os.remove(used_path)


def new_challenge(challenge_path: str, size: int, batch: int) -> bytes:
    """new_constrained.rs:14-103; returns the Blake2b hash of the file."""
    params = CeremonyParams(size, batch)
    real, challenge_path = challenge_path, _out_path(challenge_path)
    with open(challenge_path, "wb") as f:
        f.truncate(params.accumulator_size)
        f.seek(0)
        f.write(hashlib.blake2b(b"").digest())
        accumulator.generate_initial(f, params, compressed=False)
    digest = calculate_hash(challenge_path)
    _finish_out(real, challenge_path)
    return digest


def contribute(
    challenge_path: str,
    response_path: str,
    size: int,
    batch: int,
    rng: ChaChaRng,
    backend=None,
) -> bytes:
    """compute_constrained.rs:18-237: uncompressed challenge in, compressed
    response (accumulator + public key) out. Returns the response hash."""
    params = CeremonyParams(size, batch)
    backend = backend or _default_backend()
    real_response, response_path = response_path, _out_path(response_path)

    if os.path.getsize(challenge_path) != params.accumulator_size:
        raise ValueError("challenge file has wrong size")

    challenge_hash = calculate_hash(challenge_path)
    print("`challenge` file contains decompressed points and has a hash:")
    print(pretty_hash(challenge_hash))

    pubkey, privkey = keypair(rng, challenge_hash)

    with open(challenge_path, "rb") as fin, open(response_path, "wb") as fout:
        fout.truncate(params.contribution_size)
        fout.seek(0)
        fout.write(challenge_hash)
        accumulator.transform(
            fin,
            fout,
            params,
            privkey,
            backend,
            input_compressed=False,
            output_compressed=True,
            check_input=False,
        )
        fout.seek(params.pubkey_position(output_is_compressed=True))
        fout.write(pubkey.serialize())

    response_hash = calculate_hash(response_path)
    _finish_out(real_response, response_path)
    print("Your contribution has been written; response hash:")
    print(pretty_hash(response_hash))
    return response_hash


def verify_transform(
    challenge_path: str,
    response_path: str,
    new_challenge_path: str,
    size: int,
    batch: int,
    backend=None,
) -> bytes:
    """verify_transform_constrained.rs:18-255. Returns new challenge hash."""
    params = CeremonyParams(size, batch)
    backend = backend or _default_backend()
    real_new, new_challenge_path = new_challenge_path, _out_path(new_challenge_path)

    if os.path.getsize(challenge_path) != params.accumulator_size:
        raise ValueError("challenge file has wrong size")
    if os.path.getsize(response_path) != params.contribution_size:
        raise ValueError("response file has wrong size")

    challenge_hash = calculate_hash(challenge_path)
    with open(response_path, "rb") as f:
        response_claimed_hash = f.read(HASH_SIZE)
    if response_claimed_hash != challenge_hash:
        raise ValueError("hash chain failure: response is not based on this challenge")

    response_hash = calculate_hash(response_path)

    with open(response_path, "rb") as f:
        f.seek(params.pubkey_position(output_is_compressed=True))
        pubkey = PublicKey.deserialize(f.read(params.public_key_size))

    with open(challenge_path, "rb") as fin, open(response_path, "rb") as fout:
        ok = accumulator.verify_transformation(
            fin,
            fout,
            pubkey,
            challenge_hash,
            params,
            backend,
            input_compressed=False,
            output_compressed=True,
            check_input=False,
            check_output=True,
        )
    if not ok:
        raise ValueError("INVALID CONTRIBUTION")
    print("Verification succeeded! Writing new challenge file...")

    with open(response_path, "rb") as fin, open(new_challenge_path, "wb") as fnew:
        fnew.truncate(params.accumulator_size)
        fnew.seek(0)
        fnew.write(response_hash)
        accumulator.decompress(fin, fnew, params, backend, check_input=False)

    new_hash = calculate_hash(new_challenge_path)
    _finish_out(real_new, new_challenge_path)
    print("New challenge hash:")
    print(pretty_hash(new_hash))
    return new_hash


# ---------------------------------------------------------------------------
# argv entry points (argv layout matches the reference binaries)
# ---------------------------------------------------------------------------

def main_new(argv=None):
    ap = argparse.ArgumentParser(prog="new_constrained")
    ap.add_argument("challenge_file")
    ap.add_argument("circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    a = ap.parse_args(argv)
    h = new_challenge(a.challenge_file, a.circuit_power, a.batch_size)
    print("Empty contribution is formed with a hash:")
    print(pretty_hash(h))


def main_compute(argv=None):
    ap = argparse.ArgumentParser(prog="compute_constrained")
    ap.add_argument("challenge_file")
    ap.add_argument("response_file")
    ap.add_argument("circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    ap.add_argument("--entropy", default=None, help="skip the interactive prompt")
    a = ap.parse_args(argv)
    entropy = a.entropy
    if entropy is None:
        print("Type some random text and press [ENTER] to provide additional entropy...")
        entropy = sys.stdin.readline()
    # participant_rng broadcasts the coordinator's final seed digest when a
    # multi-host process group is configured (covers OS + user entropy).
    rng = participant_rng(entropy)
    contribute(a.challenge_file, a.response_file, a.circuit_power, a.batch_size, rng)


def main_beacon(argv=None):
    ap = argparse.ArgumentParser(prog="beacon_constrained")
    ap.add_argument("challenge_file")
    ap.add_argument("response_file")
    ap.add_argument("circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    ap.add_argument("beacon_hash", help="32-byte hex beacon value")
    ap.add_argument("num_iterations_exp", type=int)
    a = ap.parse_args(argv)
    rng = beacon_rng(a.beacon_hash, a.num_iterations_exp)
    contribute(a.challenge_file, a.response_file, a.circuit_power, a.batch_size, rng)


def main_verify(argv=None):
    ap = argparse.ArgumentParser(prog="verify_transform_constrained")
    ap.add_argument("challenge_file")
    ap.add_argument("response_file")
    ap.add_argument("new_challenge_file")
    ap.add_argument("circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    a = ap.parse_args(argv)
    verify_transform(
        a.challenge_file, a.response_file, a.new_challenge_file, a.circuit_power, a.batch_size
    )


def main_prepare_phase2(argv=None):
    ap = argparse.ArgumentParser(prog="prepare_phase2")
    ap.add_argument("response_file")
    ap.add_argument("circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    ap.add_argument("--out-dir", default=".")
    a = ap.parse_args(argv)
    from ..ceremony.prepare import prepare_phase2

    prepare_phase2(
        a.response_file, a.circuit_power, a.batch_size, _default_backend(), out_dir=a.out_dir
    )


def main_reduce_powers(argv=None):
    ap = argparse.ArgumentParser(prog="reduce_powers")
    ap.add_argument("challenge_file")
    ap.add_argument("reduced_challenge_file")
    ap.add_argument("original_circuit_power", type=int)
    ap.add_argument("reduced_circuit_power", type=int)
    ap.add_argument("batch_size", type=int)
    a = ap.parse_args(argv)
    from ..ceremony.prepare import reduce_powers

    reduce_powers(
        a.challenge_file,
        a.reduced_challenge_file,
        a.original_circuit_power,
        a.reduced_circuit_power,
        a.batch_size,
    )
