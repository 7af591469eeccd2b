#!/usr/bin/env python3
"""Generate a local sf1 fixture (10x sf0.1) for the scale sweep.

Usage: python3 tools/make_sf1.py [outDir]   (default target/sf1)

Generates documents/embeddings (the tables the dedup/ANN/text board
reads), events (time-shifted copies for the window family), and the
TPC-H tables (key-shifted fact copies for the relational/sketch board;
dims verbatim -- facts grow faster than dims, so joins fan out 10x).
Copy 0 is sf0.1 verbatim; copies 1..9 shift ids by copy*N and perturb
content deterministically (zlib.crc32 seeds) so that:
  - each copy's INTERNAL near-dup structure mirrors sf0.1 (pair counts,
    cluster sizes and text statistics scale ~linearly), and
  - cross-copy pairs stay below the Jaccard/hamming thresholds (every
    other word resampled from the same vocabulary), so the pair graph
    does NOT explode quadratically in the copy count.
Dev tool only -- never shipped; the driver's sf dirs stay read-only.
"""
import sys, zlib
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def h32(*parts):
    return zlib.crc32(":".join(str(p) for p in parts).encode()) & 0xFFFFFFFF


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"

    docs = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = docs.column("doc_id").to_pylist()
    n_docs = docs.num_rows
    # stride by max(id)+1, not row count: sparse ids would otherwise
    # collide across copies and silently corrupt the pair statistics
    doc_stride = max(doc_id) + 1
    text = docs.column("text").to_pylist()
    lang = docs.column("lang").to_pylist()
    source = docs.column("source").to_pylist()
    vocab = sorted({w for t in text for w in t.split(" ") if w})

    d_id, d_text, d_lang, d_src, d_nch = [], [], [], [], []
    for c in range(COPIES):
        for i in range(n_docs):
            if c == 0:
                t = text[i]
            else:
                words = text[i].split(" ")
                t = " ".join(
                    vocab[h32(c, doc_id[i], p) % len(vocab)]
                    if h32("flip", c, doc_id[i], p) % 2 == 0 else w
                    for p, w in enumerate(words))
            d_id.append(c * doc_stride + doc_id[i])
            d_text.append(t)
            d_lang.append(lang[i])
            d_src.append(source[i])
            d_nch.append(len(t))
    pq.write_table(pa.table({
        "doc_id": pa.array(d_id, pa.int64()),
        "text": pa.array(d_text, pa.string()),
        "lang": pa.array(d_lang, pa.string()),
        "source": pa.array(d_src, pa.string()),
        "n_chars": pa.array(d_nch, pa.int64()),
    }), f"{out}/documents.parquet")
    print(f"documents: {len(d_id)} rows")

    # events: copies are TIME-SHIFTED (31-day stride), so the 5 series
    # keep their identity while the per-series row count grows 10x — the
    # exact shape the metric_anomaly range-split exists for. ts is written
    # as TIMESTAMP(NANOS) to match the driver fixture (Tables.events reads
    # nanos-as-long).
    ev = pq.read_table(f"{SRC}/events.parquet")
    n_ev = ev.num_rows
    ev_id = ev.column("event_id").to_pylist()
    ev_ts = ev.column("ts").to_pylist()
    ev_uid = ev.column("user_id").to_pylist()
    ev_ty = ev.column("event_type").to_pylist()
    ev_val = ev.column("value").to_pylist()
    ev_pr = ev.column("props").to_pylist()
    ev_stride = max(ev_id) + 1
    import datetime
    day31 = datetime.timedelta(days=31)
    v_id, v_ts, v_uid, v_ty, v_val, v_pr = [], [], [], [], [], []
    for c in range(COPIES):
        for i in range(n_ev):
            v_id.append(c * ev_stride + ev_id[i])
            v_ts.append(ev_ts[i] + c * day31)
            v_uid.append(ev_uid[i])
            v_ty.append(ev_ty[i])
            v_val.append(ev_val[i])
            v_pr.append(ev_pr[i])
    pq.write_table(pa.table({
        "event_id": pa.array(v_id, pa.int64()),
        "ts": pa.array(v_ts, pa.timestamp("ns")),
        "user_id": pa.array(v_uid, pa.int64()),
        "event_type": pa.array(v_ty, pa.string()),
        "value": pa.array(v_val, pa.float64()),
        "props": pa.array(v_pr, pa.string()),
    }), f"{out}/events.parquet")
    print(f"events: {len(v_id)} rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = emb.column("vec_id").to_pylist()
    n_vec = emb.num_rows
    vec_stride = max(vec_id) + 1
    vecs = emb.column("embedding").to_pylist()
    label = emb.column("label").to_pylist()
    e_id, e_vec, e_lab = [], [], []
    for c in range(COPIES):
        for i in range(n_vec):
            if c == 0:
                v = vecs[i]
            else:
                v = [x + ((h32(c, vec_id[i], j) % 1001) - 500) / 10000.0
                     for j, x in enumerate(vecs[i])]
            e_id.append(c * vec_stride + vec_id[i])
            e_vec.append(v)
            e_lab.append(label[i])
    pq.write_table(pa.table({
        "vec_id": pa.array(e_id, pa.int64()),
        "embedding": pa.array(e_vec, pa.list_(pa.float32())),
        "label": pa.array(e_lab, pa.int32()),
    }), f"{out}/embeddings.parquet")
    print(f"embeddings: {len(e_id)} rows")

    # TPC-H: facts (lineitem/orders/customer) get key-shifted copies so
    # referential joins scale linearly -- l_orderkey and o_custkey shift by
    # the SAME strides as their parents. Vectorized (pyarrow compute): the
    # 6M-row sf1 lineitem is too big for python-list row loops. Non-key
    # columns (dates, prices, flags) are unchanged, so group-by
    # cardinalities stay fixed while groups grow 10x -- the aggregation
    # shape a real 100 TB fact table has.
    import pyarrow.compute as pc

    def fact_copies(name, shift_cols):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        copies = []
        for c in range(COPIES):
            cols = {}
            for col in t.column_names:
                arr = t.column(col)
                if c > 0 and col in shift_cols:
                    arr = pc.add(arr, c * shift_cols[col])
                cols[col] = arr
            copies.append(pa.table(cols))
        merged = pa.concat_tables(copies)
        pq.write_table(merged, f"{out}/{name}.parquet")
        print(f"{name}: {merged.num_rows} rows")

    o_stride = pc.max(
        pq.read_table(f"{SRC}/orders.parquet", columns=["o_orderkey"])
        .column("o_orderkey")).as_py() + 1
    c_stride = pc.max(
        pq.read_table(f"{SRC}/customer.parquet", columns=["c_custkey"])
        .column("c_custkey")).as_py() + 1
    fact_copies("customer", {"c_custkey": c_stride})
    fact_copies("orders", {"o_orderkey": o_stride, "o_custkey": c_stride})
    fact_copies("lineitem", {"l_orderkey": o_stride})
    for dim in ("supplier", "part", "nation", "region"):
        t = pq.read_table(f"{SRC}/{dim}.parquet")
        pq.write_table(t, f"{out}/{dim}.parquet")
        print(f"{dim}: {t.num_rows} rows (verbatim dim)")


if __name__ == "__main__":
    main()
