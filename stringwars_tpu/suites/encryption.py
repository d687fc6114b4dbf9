"""Encryption suite: AEAD keygen / encrypt / decrypt (reference
``encryption/bench.rs``, defaults 5 s + 10 s, lines tokens).

Cipher registry of (label, nonce_len, encrypt, decrypt) entries — the
reference's registry-of-triples shape (``encryption/bench.py:104-156``)
sweeping three AEADs (``encryption/bench.rs:87-125``): on-device
ChaCha20-Poly1305 and XChaCha20-Poly1305 (TPUs have no AES units;
SURVEY.md K13), plus AES-256-GCM as a host baseline via the
``cryptography`` library (the reference's OpenSSL rows). Nonces are
counter-derived (reference ``encryption/bench.rs:87-125``); decryption
pre-encrypts the corpus once and reports plaintext-byte throughput
(``encryption/bench.rs:362-367``).
"""

from __future__ import annotations

import numpy as np

from stringwars_tpu.ops import chacha as CC
from stringwars_tpu.suites._common import SuiteContext, setup_suite
from stringwars_tpu.utils.harness import WorkUnits


def counter_nonce(i: int, size: int = 12) -> bytes:
    return i.to_bytes(size, "little")


def device_ciphers() -> list[tuple[str, int, object, object]]:
    """(label, nonce_len, encrypt(key, nonce, pt) -> (ct, tag),
    decrypt(key, nonce, ct, tag) -> pt) for the on-device AEADs."""
    return [
        ("swtpu::chacha20poly1305", 12, CC.aead_encrypt, CC.aead_decrypt),
        ("swtpu::xchacha20poly1305", 24, CC.xchacha_aead_encrypt, CC.xchacha_aead_decrypt),
    ]


def main() -> None:
    ctx = setup_suite(
        "AEAD throughput (ChaCha20/XChaCha20-Poly1305 on-device; AES-GCM host)",
        default_tokens="lines",
        default_warmup=5.0,
        default_time=10.0,
        default_synthetic="long-lines",
    )
    key = bytes(range(32))
    tokens = [t for t in ctx.tape.to_list() if t][:4096]
    sample = tokens[:64]
    sample_bytes = sum(map(len, sample))
    corpus = np.asarray(ctx.tape.data)[: ctx.tape.total_bytes]

    ctx.group("keygen")
    from stringwars_tpu.ops.memops import fill_random

    seed_box = [0]

    # Per-cipher keygen rows (reference measures key+nonce generation for
    # each AEAD, ``encryption/bench.rs:87-125``): a fresh 256-bit key plus
    # a cipher-sized nonce per call, from the device Threefry generator.
    for label, nlen, _encrypt, _decrypt in device_ciphers():

        def keygen_cipher(nlen=nlen) -> WorkUnits:
            seed_box[0] += 1
            np.asarray(fill_random(seed_box[0], 32 + nlen))
            return WorkUnits(elements=1, bytes=32 + nlen)

        ctx.run(f"keygen/{label}", "bytes", keygen_cipher)

    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        def keygen_host() -> WorkUnits:
            AESGCM.generate_key(bit_length=256)
            counter_nonce(seed_box[0], 12)
            return WorkUnits(elements=1, bytes=32 + 12)

        ctx.run("keygen/cryptography.AESGCM", "bytes", keygen_host)
    except ImportError:
        pass

    def keygen() -> WorkUnits:
        seed_box[0] += 1
        np.asarray(fill_random(seed_box[0], 32))
        return WorkUnits(elements=1, bytes=32)

    ctx.run("keygen/swtpu::fill_random", "bytes", keygen)

    ctx.group("encryption")
    for label, nlen, encrypt, _decrypt in device_ciphers():
        # Per-token AEAD round-trips are dispatch-bound on an accelerator;
        # the corpus-level row below is the TPU-shaped measurement.
        def encrypt_sample(encrypt=encrypt, nlen=nlen) -> WorkUnits:
            for i, token in enumerate(sample):
                encrypt(key, counter_nonce(i, nlen), token)
            return WorkUnits(elements=len(sample), bytes=sample_bytes)

        ctx.run(f"encryption/{label}<1chip>", "bytes", encrypt_sample)

        def encrypt_corpus(encrypt=encrypt, nlen=nlen) -> WorkUnits:
            encrypt(key, counter_nonce(0, nlen), corpus)
            return WorkUnits(elements=1, bytes=corpus.shape[0])

        ctx.run(f"encryption/{label}-corpus<1chip>", "bytes", encrypt_corpus)

    try:
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM, ChaCha20Poly1305

        host_ciphers = [
            ("cryptography.AESGCM", AESGCM(key)),
            ("cryptography.ChaCha20Poly1305", ChaCha20Poly1305(key)),
        ]
        for label, cipher in host_ciphers:

            def host_routine(cipher=cipher) -> WorkUnits:
                for i, token in enumerate(sample):
                    cipher.encrypt(counter_nonce(i), token, None)
                return WorkUnits(elements=len(sample), bytes=sample_bytes)

            ctx.run(f"encryption/{label}", "bytes", host_routine)
    except ImportError:
        from stringwars_tpu.utils.report import report_skip

        report_skip("encryption/cryptography.*", "cryptography not installed")

    ctx.group("decryption")
    for label, nlen, encrypt, decrypt in device_ciphers():
        nonce = counter_nonce(0, nlen)
        try:
            ct, tag = encrypt(key, nonce, corpus)
        except Exception as error:  # noqa: BLE001 — skip-not-crash
            from stringwars_tpu.utils.report import report_skip

            report_skip(f"decryption/{label}-corpus<1chip>", str(error))
            continue

        def decrypt_corpus(decrypt=decrypt, nonce=nonce, ct=ct, tag=tag) -> WorkUnits:
            decrypt(key, nonce, ct, tag)
            return WorkUnits(elements=1, bytes=corpus.shape[0])

        ctx.run(f"decryption/{label}-corpus<1chip>", "bytes", decrypt_corpus)


if __name__ == "__main__":
    main()
