"""Encryption suite: AEAD keygen / encrypt / decrypt (reference
``encryption/bench.rs``, defaults 5 s + 10 s, lines tokens).

On-device cipher is ChaCha20-Poly1305 (TPUs have no AES units; SURVEY.md
K13); AES-256-GCM runs as a host baseline via the ``cryptography``
library, mirroring the reference's OpenSSL rows. Nonces are counter-derived
96-bit values (reference ``encryption/bench.rs:87-125``); decryption
pre-encrypts the corpus once and reports plaintext-byte throughput
(``encryption/bench.rs:362-367``).
"""

from __future__ import annotations

import itertools

import numpy as np

from stringwars_tpu.ops import chacha as CC
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits, now_ns, paced_items


def counter_nonce(i: int) -> bytes:
    return i.to_bytes(12, "little")


def main() -> None:
    ctx = setup_suite(
        "AEAD throughput (ChaCha20-Poly1305 on-device; AES-GCM host baseline)",
        default_tokens="lines",
        default_warmup=5.0,
        default_time=10.0,
        default_synthetic="long-lines",
    )
    key = bytes(range(32))
    tokens = [t for t in ctx.tape.to_list() if t][:4096]
    total = sum(map(len, tokens))

    ctx.group("keygen")
    from stringwars_tpu.ops.memops import fill_random

    seed_box = [0]

    def keygen() -> WorkUnits:
        seed_box[0] += 1
        np.asarray(fill_random(seed_box[0], 32))
        return WorkUnits(elements=1, bytes=32)

    ctx.run("keygen/swtpu::fill_random", "bytes", keygen)

    ctx.group("encryption")
    counter = itertools.count()

    def encrypt_all() -> WorkUnits:
        for i, token in enumerate(tokens):
            CC.aead_encrypt(key, counter_nonce(i), token)
        return WorkUnits(elements=len(tokens), bytes=total)

    # Per-token AEAD round-trips are dispatch-bound on an accelerator; the
    # corpus-level row below is the TPU-shaped measurement.
    sample = tokens[:64]
    sample_bytes = sum(map(len, sample))

    def encrypt_sample() -> WorkUnits:
        for i, token in enumerate(sample):
            CC.aead_encrypt(key, counter_nonce(i), token)
        return WorkUnits(elements=len(sample), bytes=sample_bytes)

    ctx.run("encryption/swtpu::chacha20poly1305<1chip>", "bytes", encrypt_sample)

    corpus = np.asarray(ctx.tape.data)[: ctx.tape.total_bytes]

    def encrypt_corpus() -> WorkUnits:
        CC.aead_encrypt(key, counter_nonce(0), corpus)
        return WorkUnits(elements=1, bytes=corpus.shape[0])

    ctx.run("encryption/swtpu::chacha-corpus<1chip>", "bytes", encrypt_corpus)

    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM, ChaCha20Poly1305

        aes = AESGCM(key)
        cc_host = ChaCha20Poly1305(key)

        def aes_routine() -> WorkUnits:
            for i, token in enumerate(sample):
                aes.encrypt(counter_nonce(i), token, None)
            return WorkUnits(elements=len(sample), bytes=sample_bytes)

        ctx.run("encryption/cryptography.AESGCM", "bytes", aes_routine)

        def cc_host_routine() -> WorkUnits:
            for i, token in enumerate(sample):
                cc_host.encrypt(counter_nonce(i), token, None)
            return WorkUnits(elements=len(sample), bytes=sample_bytes)

        ctx.run("encryption/cryptography.ChaCha20Poly1305", "bytes", cc_host_routine)
    except ImportError:
        from stringwars_tpu.utils.report import report_skip

        report_skip("encryption/cryptography.*", "cryptography not installed")

    ctx.group("decryption")
    ct, tag = CC.aead_encrypt(key, counter_nonce(0), corpus)

    def decrypt_corpus() -> WorkUnits:
        CC.aead_decrypt(key, counter_nonce(0), ct, tag)
        return WorkUnits(elements=1, bytes=corpus.shape[0])

    ctx.run("decryption/swtpu::chacha-corpus<1chip>", "bytes", decrypt_corpus)


if __name__ == "__main__":
    main()
