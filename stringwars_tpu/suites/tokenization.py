"""Tokenization suite: whitespace/newline splits, TR29 segmentation,
UTF-8 machinery (reference ``tokenization/bench.rs``, defaults 3 s + 20 s,
lines tokens; splitters process the corpus per call and report segments,
counters scan the whole file).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops import segment as SEG
from stringwars_tpu.ops import utf8 as U8
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, sync


def main() -> None:
    ctx = setup_suite(
        "Segmentation + UTF-8 machinery throughput",
        default_tokens="file",
        default_warmup=3.0,
        default_time=20.0,
        default_synthetic="multilingual",
    )
    n = ctx.tape.total_bytes
    data = jnp.asarray(np.asarray(ctx.tape.data)[:n])
    host_bytes = np.asarray(data).tobytes()

    ctx.group("tokenize-whitespace")
    ws = jax.jit(SEG.whitespace_token_count, static_argnames=("n",))
    ctx.run(
        "tokenize-whitespace/swtpu::split<1chip>",
        "bytes",
        lambda: (sync(ws(data, n)), WorkUnits(1, n))[1],
    )
    host_text = host_bytes.decode("utf-8", "ignore")
    ctx.run(
        "tokenize-whitespace/str.split",
        "bytes",
        lambda: (len(host_text.split()), WorkUnits(1, n))[1],
    )

    ctx.group("tokenize-newlines")
    nl = jax.jit(SEG.newline_split_count, static_argnames=("n",))
    ctx.run(
        "tokenize-newlines/swtpu::split<1chip>",
        "bytes",
        lambda: (sync(nl(data, n)), WorkUnits(1, n))[1],
    )
    ctx.run(
        "tokenize-newlines/str.splitlines",
        "bytes",
        lambda: (len(host_text.splitlines()), WorkUnits(1, n))[1],
    )

    ctx.group("tokenize-words-tr29")
    wb = jax.jit(SEG.word_boundaries, static_argnames=("n",))
    ctx.run(
        "tokenize-words-tr29/swtpu::words<1chip>",
        "bytes",
        lambda: (sync(wb(data, n)), WorkUnits(1, n))[1],
    )
    import regex as regex_mod

    ctx.run(
        "tokenize-words-tr29/regex-WORD",
        "bytes",
        lambda: (
            sum(1 for _ in regex_mod.finditer(r"\b", host_text, flags=regex_mod.V1 | regex_mod.WORD)),
            WorkUnits(1, n),
        )[1],
    )

    ctx.group("tokenize-graphemes-tr29")
    gb = jax.jit(SEG.grapheme_boundaries, static_argnames=("n",))
    ctx.run(
        "tokenize-graphemes-tr29/swtpu::graphemes<1chip>",
        "bytes",
        lambda: (sync(gb(data, n)), WorkUnits(1, n))[1],
    )
    ctx.run(
        "tokenize-graphemes-tr29/regex-\\X",
        "bytes",
        lambda: (len(regex_mod.findall(r"\X", host_text)), WorkUnits(1, n))[1],
    )

    ctx.group("tokenize-sentences-tr29")
    sb = jax.jit(SEG.sentence_boundaries, static_argnames=("n",))
    ctx.run(
        "tokenize-sentences-tr29/swtpu::sentences<1chip>",
        "bytes",
        lambda: (sync(sb(data, n)), WorkUnits(1, n))[1],
    )

    ctx.group("tokenize-lines-uax14")
    lb = jax.jit(SEG.linebreak_opportunities, static_argnames=("n",))
    ctx.run(
        "tokenize-lines-uax14/swtpu::linebreaks<1chip>",
        "bytes",
        lambda: (sync(lb(data, n)), WorkUnits(1, n))[1],
    )

    ctx.group("utf8-length")
    cnt = jax.jit(U8.utf8_count, static_argnames=("n",))
    ctx.run(
        "utf8-length/swtpu::count_utf8<1chip>",
        "bytes",
        lambda: (sync(cnt(data, n)), WorkUnits(1, n))[1],
    )
    ctx.run(
        "utf8-length/bytes.decode-len",
        "bytes",
        lambda: (len(host_bytes.decode("utf-8", "ignore")), WorkUnits(1, n))[1],
    )

    ctx.group("utf8-iterate")
    dec = jax.jit(U8.utf8_decode, static_argnames=("n",))
    ctx.run(
        "utf8-iterate/swtpu::decode_utf32<1chip>",
        "bytes",
        lambda: (sync(dec(data, n)), WorkUnits(1, n))[1],
    )

    ctx.group("find-nth-utf8")
    nth = jax.jit(U8.utf8_find_nth, static_argnames=("n",))
    total_cp = int(cnt(data, n))
    last = jnp.int32(max(total_cp - 1, 0))
    ctx.run(
        "find-nth-utf8/swtpu::find_nth<1chip>",
        "bytes",
        lambda: (sync(nth(data, n, last)), WorkUnits(1, n))[1],
    )

    # --- Byte-level BPE over regex pre-split pretokens (BASELINE.json
    # configs 1 & 5: "regex-pre-split byte-level tokenization with
    # replicated merge/vocab tables").
    ctx.group("tokenize-bpe")
    try:
        import regex as _re

        from stringwars_tpu.ops.bpe import (
            MergeTable,
            bpe_encode,
            bpe_encode_ref,
            train_merges,
        )
        from stringwars_tpu.tape import PaddedTokens

        # GPT-2's pre-tokenization pattern (public; Radford et al. 2019).
        gpt2_pat = _re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
        )
        pretokens = [
            p.encode("utf-8") for p in gpt2_pat.findall(host_text[: 4 << 20])
        ]
        pretokens = [p for p in pretokens if 0 < len(p) <= 32][:400_000]
        merges = train_merges(pretokens[:30_000], 512)
        table = MergeTable.from_merges(merges)
        W = max(max(map(len, pretokens), default=1), 1)
        mat = np.zeros((len(pretokens), W), np.uint8)
        for i, t in enumerate(pretokens):
            mat[i, : len(t)] = np.frombuffer(t, np.uint8)
        staged = PaddedTokens(
            data=jax.device_put(mat),
            lengths=jax.device_put(
                np.array([len(t) for t in pretokens], np.int32)
            ),
            width=W,
        )
        pre_bytes = int(sum(map(len, pretokens)))
        enc = jax.jit(lambda t: bpe_encode(t, table))

        def bpe_routine() -> WorkUnits:
            sync(enc(staged))
            return WorkUnits(elements=len(pretokens), bytes=pre_bytes)

        ctx.run("tokenize-bpe/swtpu::bpe_encode<1chip>", "bytes", bpe_routine)

        sample = pretokens[:2000]
        sample_bytes = sum(map(len, sample))

        def bpe_host() -> WorkUnits:
            for t in sample:
                bpe_encode_ref(t, merges)
            return WorkUnits(elements=len(sample), bytes=sample_bytes)

        ctx.run("tokenize-bpe/python-bpe", "bytes", bpe_host)
    except Exception as error:  # noqa: BLE001 — skip-not-crash
        from stringwars_tpu.utils.report import report_skip

        report_skip("tokenize-bpe/*", f"{type(error).__name__}: {error}")


if __name__ == "__main__":
    main()
