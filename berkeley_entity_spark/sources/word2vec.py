"""word2vec `-binary 1` reader (SURVEY.md S7).

Format (wikivec/w2vReader.scala:14-72): ASCII header "numwords vdim\n",
then per entry: word bytes up to a space, vdim little-endian float32
(the reference reads big-endian ints and flips to LE — the on-disk layout
is LE), optionally a SECOND vdim-float block when the file carries the
reference's dual "negvectors" layout, then a '\n' terminator (the standard
word2vec.c layout omits it — both are accepted).

Spark-first shape: spark.read.format("binaryFile") over a file or a
directory of shards; each shard parses in one task with numpy.frombuffer
(the format is inherently sequential per file, so the parallel unit is the
shard — exactly how multi-GB embedding dumps are shipped).  Output:
(word string, vector array<float>[, neg_vector array<float>]).

getContextV / computeP (w2vReader.scala:77-110) become plain DataFrame
ops downstream: mean-pool via explode+groupBy, inner products via the
similarity operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _parse_w2v_bytes(buf: bytes, negvectors: bool):
    # header-level truncation (zero-byte / newline-less / garbage header)
    # yields zero entries, like any other truncated-EOF case
    nl = buf.find(b"\n")
    if nl < 0:
        return [], 0
    try:
        numwords, vdim = (int(x) for x in buf[:nl].split())
    except ValueError:
        return [], 0
    if vdim <= 0:
        return [], 0
    pos = nl + 1
    vec_bytes = 4 * vdim
    need = vec_bytes * (2 if negvectors else 1)
    out = []
    for _ in range(numwords):
        if pos >= len(buf):
            break
        sp = buf.find(b" ", pos)
        # truncated entry: keep what parsed so far (the reference swallows
        # EOFException the same way — w2vReader.scala:70)
        if sp < 0 or sp + 1 + need > len(buf):
            break
        word = buf[pos:sp].decode("utf-8", errors="replace").lstrip("\n")
        pos = sp + 1
        vec = np.frombuffer(buf, dtype="<f4", count=vdim, offset=pos)
        pos += vec_bytes
        neg = None
        if negvectors:
            neg = np.frombuffer(buf, dtype="<f4", count=vdim, offset=pos)
            pos += vec_bytes
        if pos < len(buf) and buf[pos] == 0x0A:  # optional '\n' terminator
            pos += 1
        out.append((word, vec, neg))
    return out, vdim


def read_word2vec_bin(
    spark: SparkSession, path: str, negvectors: bool = False
) -> DataFrame:
    """Read one .bin file or a directory of shard files into a DataFrame."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    cols = "word string, vector array<float>" + (
        ", neg_vector array<float>" if negvectors else ""
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows, _ = _parse_w2v_bytes(bytes(content), negvectors)
                if not rows:  # header-only / fully truncated shard
                    continue
                data = {
                    "word": [w for w, _, _ in rows],
                    "vector": [v.tolist() for _, v, _ in rows],
                }
                if negvectors:
                    data["neg_vector"] = [n.tolist() for _, _, n in rows]
                yield pd.DataFrame(data)

    return files.mapInPandas(gen, schema=cols)


def write_word2vec_bin(
    path: str,
    words: list[str],
    vectors: np.ndarray,
    neg_vectors: np.ndarray | None = None,
    terminator: bool = True,
) -> None:
    """Test/fixture writer for the same layout."""
    n, d = vectors.shape
    with open(path, "wb") as f:
        f.write(f"{n} {d}\n".encode())
        for i, w in enumerate(words):
            f.write(w.encode() + b" ")
            f.write(struct.pack(f"<{d}f", *vectors[i].tolist()))
            if neg_vectors is not None:
                f.write(struct.pack(f"<{d}f", *neg_vectors[i].tolist()))
            if terminator:
                f.write(b"\n")
