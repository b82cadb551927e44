"""Bag-of-words retrieval over binary descriptors — DBoW2 equivalent.

Replaces the reference's DBoW2 vocabulary + database (sources/core/system/
loop_detector.{h,cpp}, FBrisk adapter fbrisk.h:35-54, vocab built by the
voc_builder tool). TPU-native design: a FLAT vocabulary of V binary centroids
instead of a k-means tree — word assignment is one batched Hamming
distance-matrix + argmin (the tree only exists to make CPU lookup cheap; on
TPU the dense [K, V] distance computation is a single fused op), tf-idf BoW
vectors, and the DBoW2 L1 similarity score
  s(v, w) = 1 - 0.5 * || v/|v|_1 - w/|w|_1 ||_1.
Database queries score ALL stored keyframes in one matmul-shaped op.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.matching import popcount32

Array = jax.Array


class Vocabulary(NamedTuple):
    words: Array    # [V, 8] uint32 binary centroids
    idf: Array      # [V] inverse document frequency weights


def train_vocabulary(descriptors: np.ndarray, num_words: int = 256,
                     iters: int = 8, seed: int = 0) -> Vocabulary:
    """Binary k-means (k-majority) over training descriptors [N, 8] uint32 —
    the voc_builder equivalent. Host-side, run offline."""
    rng = np.random.RandomState(seed)
    N = descriptors.shape[0]
    words = descriptors[rng.choice(N, min(num_words, N), replace=False)]
    if words.shape[0] < num_words:
        words = np.concatenate(
            [words, rng.randint(0, 2**32, (num_words - words.shape[0], 8),
                                dtype=np.uint32)]
        )
    bits = np.unpackbits(
        descriptors.view(np.uint8).reshape(N, 32), axis=1
    )  # [N, 256]
    for _ in range(iters):
        d = _hamming_np(descriptors, words)
        assign = d.argmin(axis=1)
        new_words = []
        for v in range(num_words):
            sel = bits[assign == v]
            if len(sel) == 0:
                new_words.append(words[v])
                continue
            maj = (sel.mean(axis=0) > 0.5).astype(np.uint8)
            new_words.append(
                np.packbits(maj).view(np.uint32)
            )
        words = np.stack(new_words)
    # idf from training assignment frequencies
    d = _hamming_np(descriptors, words)
    assign = d.argmin(axis=1)
    counts = np.bincount(assign, minlength=num_words).astype(np.float32)
    idf = np.log(N / np.maximum(counts, 1.0))
    return Vocabulary(words=jnp.asarray(words), idf=jnp.asarray(idf))


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(
        x.view(np.uint8).reshape(a.shape[0], b.shape[0], 32), axis=2
    ).sum(axis=2)


def save_vocabulary(path: str, voc: Vocabulary) -> None:
    np.savez(path, words=np.asarray(voc.words), idf=np.asarray(voc.idf))


def load_vocabulary(path: str) -> Vocabulary:
    """Load a trained vocabulary (.npz from save_vocabulary /
    tools/voc_builder.py) — the reference loads its DBoW2 vocab at Init
    (loop_detector.cpp:26-34)."""
    d = np.load(path)
    return Vocabulary(words=jnp.asarray(d["words"].astype(np.uint32)),
                      idf=jnp.asarray(d["idf"].astype(np.float32)))


def default_vocabulary(num_words: int = 256) -> Vocabulary:
    """The shipped room-corpus vocabulary if present, else random LSH."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "data",
        "voc_room256.npz")
    if os.path.exists(path):
        return load_vocabulary(path)
    return random_vocabulary(num_words)


def random_vocabulary(num_words: int = 256, seed: int = 3) -> Vocabulary:
    """LSH-style random vocabulary — usable without training data (random
    binary centroids still partition descriptor space)."""
    rng = np.random.RandomState(seed)
    words = rng.randint(0, 2**32, (num_words, 8), dtype=np.uint32)
    return Vocabulary(words=jnp.asarray(words),
                      idf=jnp.ones((num_words,), jnp.float32))


@jax.jit
def bow_vector(voc: Vocabulary, desc: Array, valid: Array) -> Array:
    """tf-idf BoW vector [V] from descriptors [K, 8] with validity mask."""
    x = jnp.bitwise_xor(desc[:, None, :], voc.words[None, :, :])
    d = jnp.sum(popcount32(x), axis=-1)  # [K, V]
    assign = jnp.argmin(d, axis=-1)      # [K]
    V = voc.words.shape[0]
    hist = jnp.zeros((V,), jnp.float32).at[assign].add(
        valid.astype(jnp.float32)
    )
    v = hist * voc.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@jax.jit
def similarity(v: Array, db: Array, db_valid: Array) -> Array:
    """DBoW2 L1 score of v [V] against all database rows [K, V] -> [K]."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(v[None, :] - db), axis=-1)
    return jnp.where(db_valid, s, -jnp.inf)
