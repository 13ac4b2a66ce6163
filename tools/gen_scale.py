"""Measurement-only stand-in for the driver's larger scale factors.

The driver escalated its round-5 measurement to sf1.0 (BENCH_r05.json
"sf": "1.0", n_turns=1,000,000) but only sf0.001/0.01/0.1 ship in
/root/testdata. This tool scales sf0.1 by an integer FACTOR in a way
that preserves the per-replica statistical structure every benched
operator keys on, so optimizations measured here transfer:

  - events: FACTOR replicas with disjoint event_id / user_id ranges —
    conv count scales linearly, per-conversation turn counts and the
    4-shape text mix are unchanged (transcripts.TRANSCRIPTS_SQL keys
    on user_id / event_id arithmetic).
  - documents: FACTOR replicas with disjoint doc_ids; every token in
    replica k>0 is prefixed "r{k}" — a bijection on the token
    vocabulary, so WITHIN a replica all shingle/Jaccard/simhash/
    minhash relations are exactly those of sf0.1 while replicas never
    collide (near-dup pair counts scale linearly, like a real larger
    corpus, never quadratically).
  - embeddings: FACTOR replicas with disjoint vec_ids; replica k>0 is
    reflected through a deterministic per-dimension sign pattern — an
    orthogonal transform, so within-replica cosines are bit-preserved
    and cross-replica pairs decorrelate.
  - the small TPC-H dims are copied verbatim (no benched query reads
    them at scale).

Usage: python tools/gen_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/sfx/sf1.0

This is a BENCH HARNESS tool: nothing in the engine or the frozen
bench/oracle surface reads its output unless $SPARK_GRAFT_SF_DIR
points at it.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = "region nation customer supplier part orders lineitem".split()
_WORD = re.compile(r"\S+")


def scale_events(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(f"{src}/events.parquet")
    n = t.num_rows
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    e_span = int(eid.max()) + 1
    u_span = int(uid.max()) + 1
    chunks = []
    for k in range(factor):
        tk = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.array(eid + k * e_span, type=pa.int64()),
        )
        tk = tk.set_column(
            tk.schema.get_field_index("user_id"),
            "user_id",
            pa.array(uid + k * u_span, type=pa.int64()),
        )
        chunks.append(tk)
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{dst}/events.parquet")
    print(f"events: {n} -> {out.num_rows}")


def scale_documents(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(f"{src}/documents.parquet")
    did = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    d_span = int(did.max()) + 1
    chunks = [t]
    for k in range(1, factor):
        # the section-sign separator keeps the prefix injective: an
        # original token can only collide with replica k's image of
        # another token if it itself contains "§", which the source
        # corpus does not
        pref = f"r{k}§"
        tx = [_WORD.sub(lambda m: pref + m.group(0), s) for s in texts]
        arr_t = pa.array(tx, type=pa.string())
        tk = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(did + k * d_span, type=pa.int64()),
        )
        tk = tk.set_column(tk.schema.get_field_index("text"), "text", arr_t)
        tk = tk.set_column(
            tk.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array([len(s) for s in tx], type=pa.int64()),
        )
        chunks.append(tk)
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{dst}/documents.parquet")
    print(f"documents: {t.num_rows} -> {out.num_rows}")


def _signs(k: int, dim: int) -> np.ndarray:
    h = hashlib.md5(f"scale-signs:{k}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.choice(np.array([1.0, -1.0], dtype=np.float32), size=dim)


def scale_embeddings(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vid = t.column("vec_id").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    v_span = int(vid.max()) + 1
    dim = vecs.shape[1]
    chunks = [t]
    for k in range(1, factor):
        vk = vecs * _signs(k, dim)[None, :]
        tk = t.set_column(
            t.schema.get_field_index("vec_id"),
            "vec_id",
            pa.array(vid + k * v_span, type=pa.int64()),
        )
        tk = tk.set_column(
            tk.schema.get_field_index("embedding"),
            "embedding",
            pa.array(list(vk), type=pa.list_(pa.float32())),
        )
        chunks.append(tk)
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{dst}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/sfx/sf1.0"
    os.makedirs(dst, exist_ok=True)
    for name in COPY_TABLES:
        shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    scale_events(src, dst, factor)
    scale_documents(src, dst, factor)
    scale_embeddings(src, dst, factor)
    open(f"{dst}/_DONE", "w").close()
    print(f"wrote {dst} (factor {factor})")


if __name__ == "__main__":
    main()
