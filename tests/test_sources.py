"""picovdb file-format interop: read the reference's on-disk layout
({base}.ids.json / .vecs.npy / .meta.json, pico_vdb.py:41-51) into a
store DataFrame, query it, and export a byte-compatible store back."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.schema import K_DELETED, K_ID, K_VECTOR
from picovdb_spark.sources import read_picovdb_store, write_picovdb_store


@pytest.fixture()
def picodb_files(tmp_path):
    """A store written exactly the way the reference writes it
    (row 2 tombstoned: doc null + vector zeroed, pico_vdb.py:520-525)."""
    base = str(tmp_path / "db")
    ids = ["a", "b", "c", "d"]
    vecs = np.eye(4, dtype=np.float32)
    vecs[2] = 0.0  # deleted row's vector is zeroed
    docs = [
        {"_id_": "a", "cat": "x", "rank": 1},
        {"_id_": "b", "cat": "y", "rank": 2},
        None,  # tombstone
        {"_id_": "d", "cat": "x", "rank": 4},
    ]
    with open(f"{base}.ids.json", "w") as f:
        json.dump(ids, f)
    np.save(f"{base}.vecs.npy", vecs)
    os.replace(f"{base}.vecs.npy.npy", f"{base}.vecs.npy") if os.path.exists(
        f"{base}.vecs.npy.npy"
    ) else None
    with open(f"{base}.meta.json", "w") as f:
        json.dump({"embedding_dim": 4, "data": docs, "additional_data": {"k": "v"}}, f)
    return base


def test_read_store(spark, picodb_files):
    df = read_picovdb_store(spark, picodb_files)
    assert df.count() == 3  # tombstone excluded by default
    assert set(df.columns) >= {K_ID, K_VECTOR, K_DELETED, "cat", "rank"}
    assert df.filter(F.col(K_ID) == "b").first()["cat"] == "y"
    assert df._picovdb_additional_data == {"k": "v"}

    with_deleted = read_picovdb_store(spark, picodb_files, include_deleted=True)
    assert with_deleted.count() == 4
    assert with_deleted.filter(F.col(K_DELETED)).first()[K_ID] == "c"


def test_read_store_queryable(spark, picodb_files):
    from picovdb_spark.operators.similarity import query_one

    df = read_picovdb_store(spark, picodb_files)
    top = query_one(df, [0.0, 1.0, 0.0, 0.0], top_k=1).collect()
    assert top[0][K_ID] == "b" and abs(top[0]["_metrics_"] - 1.0) < 1e-9


def test_round_trip(spark, picodb_files, tmp_path):
    df = read_picovdb_store(spark, picodb_files, include_deleted=True)
    out_base = str(tmp_path / "out")
    write_picovdb_store(df, out_base, additional_data={"k": "v"})

    # files parse as the reference would parse them
    with open(f"{out_base}.ids.json") as f:
        ids = json.load(f)
    vecs = np.load(f"{out_base}.vecs.npy")
    with open(f"{out_base}.meta.json") as f:
        meta = json.load(f)
    assert vecs.dtype == np.float32 and vecs.shape == (4, 4)
    assert len(ids) == 4 and meta["embedding_dim"] == 4
    tomb = ids.index("c")
    assert meta["data"][tomb] is None and not vecs[tomb].any()

    back = read_picovdb_store(spark, out_base, include_deleted=True)
    a = {(r[K_ID], r[K_DELETED], r["cat"], r["rank"]) for r in df.collect()}
    b = {(r[K_ID], r[K_DELETED], r["cat"], r["rank"]) for r in back.collect()}
    assert a == b


def test_sidecar_omitted_without_faiss(spark, picodb_files, tmp_path):
    """Without the optional faiss package, write_picovdb_store succeeds
    and simply omits the `.faiss` sidecar (the reference rebuilds it on
    open). Guard only meaningful where faiss is absent."""
    try:
        import faiss  # noqa: F401

        pytest.skip("faiss installed — covered by test_faiss_sidecar_round_trip")
    except ImportError:
        pass
    df = read_picovdb_store(spark, picodb_files, include_deleted=True)
    out_base = str(tmp_path / "nofaiss")
    # plant a stale sidecar from a hypothetical earlier faiss-enabled
    # export: a non-regenerating write MUST remove it — the reference
    # only rebuilds when the file is absent, so a stale one would
    # silently serve the old vectors' neighbors
    with open(f"{out_base}.vecs.npy.faiss", "wb") as f:
        f.write(b"stale index bytes")
    write_picovdb_store(df, out_base)
    assert os.path.exists(f"{out_base}.vecs.npy")
    assert not os.path.exists(f"{out_base}.vecs.npy.faiss")
    assert not os.path.exists(f"{out_base}.vecs.npy.faiss.tmp")


def test_faiss_sidecar_round_trip(spark, picodb_files, tmp_path):
    """With faiss installed, the sidecar must deserialize as the exact
    index class the reference builds (IDMap2 over HNSWFlat, inner
    product), hold ONLY the active rows under their matrix positions,
    and answer a search (matching pico_vdb.py:261-277's reopen path,
    which accepts the sidecar instead of rebuilding)."""
    faiss = pytest.importorskip("faiss")
    df = read_picovdb_store(spark, picodb_files, include_deleted=True)
    out_base = str(tmp_path / "withfaiss")
    write_picovdb_store(df, out_base)
    idx = faiss.read_index(f"{out_base}.vecs.npy.faiss")
    assert idx.d == 4
    assert idx.ntotal == 3  # 4 rows minus 1 tombstone
    q = np.zeros((1, 4), dtype=np.float32)
    q[0, 0] = 1.0
    scores, ids = idx.search(q, 1)
    vecs = np.load(f"{out_base}.vecs.npy")
    assert vecs[ids[0][0]][0] == 1.0  # nearest to e0 is the row holding e0


def test_chunked_read(spark, tmp_path):
    base = str(tmp_path / "big")
    n, dim = 500, 8
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    ids = [f"id{i}" for i in range(n)]
    with open(f"{base}.ids.json", "w") as f:
        json.dump(ids, f)
    np.save(f"{base}.vecs.npy.tmp.npy", vecs)
    os.replace(f"{base}.vecs.npy.tmp.npy", f"{base}.vecs.npy")
    with open(f"{base}.meta.json", "w") as f:
        json.dump({"embedding_dim": dim, "data": [{"_id_": i} for i in ids]}, f)
    df = read_picovdb_store(spark, base, chunk_rows=64)
    assert df.count() == n
    assert df.rdd.getNumPartitions() >= 2  # actually chunked


def test_meta_docs_length_mismatch_raises(spark, tmp_path):
    """meta.json whose data list is shorter than ids = corrupt store —
    must raise, not silently truncate rows via zip."""
    import json

    import numpy as np

    base = str(tmp_path / "short_meta")
    ids = ["a", "b", "c"]
    np.save(base + ".vecs.npy", np.eye(3, 4, dtype=np.float32))
    with open(base + ".ids.json", "w") as f:
        json.dump(ids, f)
    with open(base + ".meta.json", "w") as f:
        json.dump({"data": [{"_id_": "a"}, {"_id_": "b"}], "additional_data": {}}, f)
    with pytest.raises(ValueError, match="corrupt store"):
        read_picovdb_store(spark, base)
