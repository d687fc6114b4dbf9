"""Hash suite: stateless / stateful / checksum groups (reference
``hash/bench.rs:483``, ``hash/bench.py:236``; defaults: words tokens,
2 s warm-up + 10 s measure).

TPU variants (library ``swtpu``) hash every token of the corpus per call,
bucketed by length into rectangular layouts; host baselines (xxhash C lib,
CPython builtins) run the same corpus item-at-a-time under the same
deadline pacing as the reference's Python suite.
"""

from __future__ import annotations

import functools
import sys

import jax
import numpy as np

from stringwars_tpu.ops import hash as H
from stringwars_tpu.parallel.mesh import DeviceScope
from stringwars_tpu.suites._common import SuiteContext, chained_layouts, setup_suite
from stringwars_tpu.tape import PaddedTokens, Tape, bucket_by_length
from stringwars_tpu.utils.config import get_env_bool
from stringwars_tpu.utils.harness import WorkUnits, now_ns, paced_items, sync

BUCKET_EDGES = [16, 64, 256, 1024, 4096]


def build_layouts(tape: Tape, scope: DeviceScope) -> list[tuple[H.HashLayout, int, int]]:
    """Bucket the tape by token length and stage sharded hash layouts.

    Returns (layout, token_count, token_bytes) per non-empty bucket; batch
    is padded to the mesh size with zero-length tokens so the leading axis
    shards evenly.
    """
    out = []
    for bucket in bucket_by_length(tape, BUCKET_EDGES):
        count = bucket.count
        total = int(np.asarray(bucket.lengths).sum())
        chips = scope.chips
        padded = ((count + chips - 1) // chips) * chips
        data = np.asarray(bucket.data)
        lengths = np.asarray(bucket.lengths)
        if padded != count:
            data = np.pad(data, ((0, padded - count), (0, 0)))
            lengths = np.pad(lengths, (0, padded - count))
        tokens = PaddedTokens(
            data=jax.device_put(data, scope.sharding(jax.sharding.PartitionSpec("shard", None))),
            lengths=jax.device_put(lengths, scope.data_sharding),
            width=bucket.width,
        )
        layout = jax.block_until_ready(H.prepare(tokens))
        out.append((layout, count, total))
    return out


def bench_tpu_hash(ctx: SuiteContext, group: str, fn, fn_name: str) -> None:
    for scope in ctx.scopes:
        try:
            layouts = build_layouts(ctx.tape, scope)
        except Exception as error:  # noqa: BLE001
            from stringwars_tpu.utils.report import report_skip

            report_skip(f"{group}/swtpu::{fn_name}{scope.name}", str(error))
            continue
        elements = sum(c for _, c, _ in layouts)
        total_bytes = sum(b for _, _, b in layouts)
        routine = chained_layouts(
            fn, [layout for layout, _, _ in layouts], WorkUnits(elements, total_bytes)
        )
        ctx.run(f"{group}/swtpu::{fn_name}{scope.name}", "bytes", routine)


def bench_tpu_xxh3(ctx: SuiteContext) -> None:
    """XXH3-64 (exact) over bucketed layouts — the reference's headline hash."""
    from stringwars_tpu.ops import xxh3 as X3

    for scope in ctx.scopes:
        layouts = []
        elements = 0
        total_bytes = 0
        try:
            for bucket in __import__("stringwars_tpu.tape", fromlist=["bucket_by_length"]).bucket_by_length(
                ctx.tape, BUCKET_EDGES
            ):
                layouts.append(jax.block_until_ready(X3.prepare3(bucket)))
                elements += bucket.count
                total_bytes += int(np.asarray(bucket.lengths).sum())
        except Exception as error:  # noqa: BLE001
            from stringwars_tpu.utils.report import report_skip

            report_skip(f"stateless/swtpu::xxh3_64{scope.name}", str(error))
            continue
        routine = chained_layouts(X3.xxh3_64, layouts, WorkUnits(elements, total_bytes))
        ctx.run(f"stateless/swtpu::xxh3_64{scope.name}", "bytes", routine)


def bench_host_hash(ctx: SuiteContext, name: str, hash_fn) -> None:
    tokens = ctx.tape.to_list()

    def routine() -> WorkUnits:
        deadline = now_ns() + int(ctx.budget.time_seconds * 1e9)
        done = 0
        done_bytes = 0
        for token in paced_items(tokens, deadline):
            hash_fn(token)
            done += 1
            done_bytes += len(token)
        return WorkUnits(elements=done, bytes=done_bytes)

    ctx.run(name, "bytes", routine)


def report_collisions(ctx: SuiteContext) -> None:
    """Opt-in collision audit (reference ``hash/bench.rs:129-167``): count
    distinct xxh64 digests against the unique-token count, to stderr."""
    layouts = build_layouts(ctx.tape, ctx.scopes[0])
    digests = np.concatenate([H.xxh64(lay).to_numpy()[:count] for lay, count, _ in layouts])
    unique_tokens = len(set(ctx.tape.to_list()))
    unique_hashes = len(np.unique(digests))
    collisions = unique_tokens - unique_hashes
    print(
        f"collisions: {collisions:,} over {unique_tokens:,} unique tokens "
        f"({100.0 * collisions / max(unique_tokens, 1):.4f}%)",
        file=sys.stderr,
        flush=True,
    )


def main() -> None:
    ctx = setup_suite(
        "Hash throughput suite (TPU kernels + host baselines)",
        default_tokens="words",
        default_warmup=2.0,
        default_time=10.0,
    )
    import xxhash

    ctx.group("stateless")
    bench_tpu_hash(ctx, "stateless", lambda l: H.swh64(l, 0), "swh64")
    bench_tpu_hash(ctx, "stateless", H.xxh64, "xxh64")
    bench_tpu_hash(ctx, "stateless", H.xxh32, "xxh32")
    bench_tpu_xxh3(ctx)
    bench_tpu_hash(
        ctx,
        "stateless",
        functools.partial(H.swh64_multiseed, seeds=np.arange(8, dtype=np.uint64)),
        "swh64_multiseed8",
    )
    bench_host_hash(ctx, "stateless/xxhash.xxh3_64", xxhash.xxh3_64_intdigest)
    bench_host_hash(ctx, "stateless/xxhash.xxh64", xxhash.xxh64_intdigest)
    bench_host_hash(ctx, "stateless/builtins.hash", hash)

    ctx.group("stateful")
    corpus = ctx.tape.data
    n = ctx.tape.total_bytes
    from stringwars_tpu.utils.harness import DeviceRoutine, fold_salt, perturb_u8

    corpus_dev = jax.device_put(np.asarray(corpus))

    def tree_body(s, e, buf):
        # Level-0 digests carry >99.9% of the tree-hash work (upper levels
        # re-hash a 1/8192 tape); the host-side level fold is untraceable.
        digests = H._tree_level(buf ^ perturb_u8(s), n)
        return fold_salt(s, digests), e

    ctx.run(
        "stateful/swtpu::tree_hash64<1chip>",
        "bytes",
        DeviceRoutine(body=tree_body, consts=(corpus_dev,), units=WorkUnits(elements=1, bytes=n)),
    )

    def host_stream() -> WorkUnits:
        hasher = xxhash.xxh64()
        hasher.update(np.asarray(corpus)[:n].tobytes())
        hasher.intdigest()
        return WorkUnits(elements=1, bytes=n)

    ctx.run("stateful/xxhash.xxh64_stream", "bytes", host_stream)

    ctx.group("checksum")
    # u32-word staging: the u8→i32 convert path runs far below the HBM
    # roofline (byte lanes tile-pad). Production path on TPU is the
    # single-pass Pallas accumulator (one corpus read); the fused-XLA
    # word reduce stays the CPU/interpret path.
    from stringwars_tpu.ops.bytesum import (
        _PL_BLK,
        _PL_LANES,
        _PL_SUB,
        _bytesum_words_pallas,
        _bytesum_words_parts,
    )

    _blk = _PL_BLK * _PL_SUB * _PL_LANES
    _nw = -(-max((n + 3) // 4, 1) // _blk) * _blk
    _wbuf = np.zeros(_nw * 4, np.uint8)
    _wbuf[:n] = np.asarray(ctx.tape.data[:n])
    _words_dev = jax.device_put(np.ascontiguousarray(_wbuf.view("<u4")))
    _on_tpu = jax.default_backend() == "tpu"

    def bytesum_body(s, e, words):
        if _on_tpu:
            hi, lo = _bytesum_words_pallas(words ^ s, n, False)
        else:
            hi, lo = _bytesum_words_parts(words ^ s, n)
        return fold_salt(s, hi, lo), e

    ctx.run(
        "checksum/swtpu::bytesum<1chip>",
        "bytes",
        DeviceRoutine(
            body=bytesum_body, consts=(_words_dev,), units=WorkUnits(elements=1, bytes=n)
        ),
    )

    # Device SHA-256: per-token digests over bucketed layouts (reference
    # hashes one token per call, hash/bench.rs:298-389).
    from stringwars_tpu.ops.sha256 import prepare_sha256, sha256

    def make_sha_routine():
        sha_layouts = []
        sha_elements = 0
        sha_bytes = 0
        for bucket in bucket_by_length(ctx.tape, BUCKET_EDGES):
            sha_layouts.append(jax.block_until_ready(prepare_sha256(bucket)))
            sha_elements += bucket.count
            sha_bytes += int(np.asarray(bucket.lengths).sum())
        return chained_layouts(sha256, sha_layouts, WorkUnits(sha_elements, sha_bytes))

    try:
        sha_routine = make_sha_routine()
    except Exception as error:  # noqa: BLE001
        from stringwars_tpu.utils.report import report_skip

        report_skip("checksum/swtpu::sha256<1chip>", str(error))
    else:
        ctx.run("checksum/swtpu::sha256<1chip>", "bytes", sha_routine)

    import hashlib
    import zlib

    host_bytes = np.asarray(corpus)[:n].tobytes()
    ctx.run(
        "checksum/zlib.crc32",
        "bytes",
        lambda: (zlib.crc32(host_bytes), WorkUnits(elements=1, bytes=n))[1],
    )
    ctx.run(
        "checksum/hashlib.sha256",
        "bytes",
        lambda: (hashlib.sha256(host_bytes).digest(), WorkUnits(elements=1, bytes=n))[1],
    )

    if get_env_bool("COLLISIONS"):
        report_collisions(ctx)


if __name__ == "__main__":
    main()
