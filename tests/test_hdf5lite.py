"""sources/hdf5lite — the dependency-free codec for the reference's
simple HDF5 layout: reader contract pinned against a CHECKED-IN binary
sample (tests/data/sample_catalog.hdf5), writer→reader round-trip,
loud refusal outside the subset, and the full O2 ingest path
(read_hdf5_directory with the DEFAULT reader, which falls back to
hdf5lite where h5py is absent — so the binary decode genuinely
executes end-to-end in this environment)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cosmap_spark.sources.hdf5lite import read_hdf5_group, write_simple_hdf5

SAMPLE = os.path.join(os.path.dirname(__file__), "data", "sample_catalog.hdf5")


def test_reader_decodes_frozen_sample():
    """The committed binary sample decodes to exactly these values and
    dtypes — the reader contract against STORED bytes, not a live
    round trip (catches reader drift independently of the writer)."""
    df = read_hdf5_group(SAMPLE, "catalog")
    assert list(df.columns) == ["dec", "halo_id", "mass", "n_sub", "ra"]
    assert df["ra"].tolist() == [10.5, 20.25, 30.125, 359.9375]
    assert df["dec"].tolist() == [-45.5, 0.0, 45.25, 89.0625]
    assert df["halo_id"].tolist() == [101, 202, 303, 404]
    assert df["n_sub"].tolist() == [3, 1, 4, 1]
    assert df["mass"].tolist() == [1.5, 2.5, 3.5, 4.5]
    assert [str(t) for t in df.dtypes] == [
        "float64", "int64", "float32", "int32", "float64",
    ]
    meta = read_hdf5_group(SAMPLE, "meta")
    assert meta["version"].tolist() == [7]
    with pytest.raises(KeyError, match="nope"):
        read_hdf5_group(SAMPLE, "nope")


def test_write_read_round_trip(tmp_path):
    rng = np.random.default_rng(9)
    cols = {
        "x": rng.normal(0, 1, 257),
        "y": rng.integers(-(2**62), 2**62, 257),
        "z": rng.normal(0, 1, 257).astype(np.float32),
        "w": rng.integers(-(2**30), 2**30, 257).astype(np.int32),
    }
    p = str(tmp_path / "rt.hdf5")
    write_simple_hdf5(p, {"catalog": {k: np.asarray(v) for k, v in cols.items()}})
    df = read_hdf5_group(p, "catalog")
    for k, v in cols.items():
        assert df[k].to_numpy().tolist() == np.asarray(v).tolist(), k
        assert df[k].dtype == np.asarray(v).dtype, k


def test_refusals_name_the_feature(tmp_path):
    p = str(tmp_path / "bad.hdf5")
    with pytest.raises(ValueError, match="1-D"):
        write_simple_hdf5(p, {"g": {"m": np.zeros((2, 2))}})
    with pytest.raises(ValueError, match="unsupported dtype"):
        write_simple_hdf5(p, {"g": {"s": np.zeros(2, dtype=np.uint16)}})
    with pytest.raises(ValueError, match="at most"):
        write_simple_hdf5(
            p, {"g": {f"c{i}": np.zeros(1) for i in range(9)}}
        )
    noth5 = str(tmp_path / "not.hdf5")
    with open(noth5, "wb") as f:
        f.write(b"PAR1 definitely not hdf5")
    with pytest.raises(ValueError, match="not an HDF5 file"):
        read_hdf5_group(noth5, "g")
    # a v2 superblock is refused by version, pointing at h5py
    v2 = str(tmp_path / "v2.hdf5")
    with open(SAMPLE, "rb") as f:
        raw = bytearray(f.read())
    raw[8] = 2
    with open(v2, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError, match="superblock v2"):
        read_hdf5_group(v2, "catalog")


def test_read_hdf5_directory_default_reader_end_to_end(spark, tmp_path):
    """The O2 ingest path with NO injected reader: two files under a
    directory, executor-side decode via the h5py-or-hdf5lite default,
    declared schema projected and ordered."""
    from cosmap_spark.sources.readers import read_hdf5_directory

    for i, ids in enumerate(([1, 2, 3], [10, 20])):
        write_simple_hdf5(
            str(tmp_path / f"part{i}.hdf5"),
            {"catalog": {
                "halo_id": np.array(ids, dtype=np.int64),
                "ra": np.array([v / 2 for v in ids], dtype=np.float64),
                "extra": np.array(ids, dtype=np.int32),  # projected away
            }},
        )
    df = read_hdf5_directory(
        spark, str(tmp_path), "halo_id long, ra double",
        dataset_key="catalog",
    )
    got = sorted((r["halo_id"], r["ra"]) for r in df.collect())
    assert got == [(1, 0.5), (2, 1.0), (3, 1.5), (10, 5.0), (20, 10.0)]
    assert df.columns == ["halo_id", "ra"]
    # a file lacking a declared column names the file in the error
    write_simple_hdf5(
        str(tmp_path / "part9.hdf5"),
        {"catalog": {"halo_id": np.array([7], dtype=np.int64)}},
    )
    bad = read_hdf5_directory(
        spark, str(tmp_path), "halo_id long, ra double",
        dataset_key="catalog",
    )
    with pytest.raises(Exception, match="part9.hdf5"):
        bad.collect()


def test_empty_group_refused(tmp_path):
    """Review fix: an empty group raises the module's contractual
    ValueError instead of an IndexError from the heap builder."""
    with pytest.raises(ValueError, match="at least one child"):
        write_simple_hdf5(str(tmp_path / "e.hdf5"), {"g": {}})
    with pytest.raises(ValueError, match="at least one child"):
        write_simple_hdf5(str(tmp_path / "e2.hdf5"), {})


CHUNKED = os.path.join(
    os.path.dirname(__file__), "data", "sample_catalog_chunked.hdf5"
)


def test_reader_decodes_frozen_chunked_gzip_sample():
    """The committed chunked+DEFLATE sample (chunk=4 over 10 rows —
    exercises multi-chunk assembly AND final-chunk padding) decodes to
    exactly these values; the reader contract against STORED bytes
    (round-8 verdict #7)."""
    df = read_hdf5_group(CHUNKED, "catalog")
    assert list(df.columns) == ["halo_id", "mass", "n_sub", "ra"]
    assert df["ra"].tolist() == [
        10.5, 20.25, 30.125, 359.9375, 0.0625, 180.5, 90.75, 270.125,
        45.0, 135.25,
    ]
    assert df["halo_id"].tolist() == list(range(101, 111))
    assert df["mass"].tolist() == [
        1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5, 10.5,
    ]
    assert df["n_sub"].tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    assert read_hdf5_group(CHUNKED, "meta")["version"].tolist() == [8]


def test_chunked_matches_contiguous_decode(tmp_path):
    """The same arrays written contiguous, chunked, and chunked+gzip
    must decode identically — the chunked path's differential against
    the proven contiguous one."""
    rng = np.random.default_rng(17)
    cols = {
        "a": rng.normal(size=513).astype("float64"),
        "b": rng.integers(-1000, 1000, 513).astype("int32"),
    }
    outs = []
    for i, kw in enumerate(
        [{}, {"chunk": 128}, {"chunk": 128, "compress": True},
         {"chunk": 128, "shuffle": True},
         {"chunk": 128, "compress": True, "shuffle": True}]
    ):
        p = str(tmp_path / f"v{i}.h5")
        write_simple_hdf5(p, {"g": cols}, **kw)
        outs.append(read_hdf5_group(p, "g"))
    for df in outs[1:]:
        for c in cols:
            assert np.array_equal(
                df[c].to_numpy(), outs[0][c].to_numpy()
            ), c
    # compressed file is genuinely smaller than raw on compressible data
    import os as _os

    z = str(tmp_path / "z.h5")
    r = str(tmp_path / "r.h5")
    smooth = {"g": {"x": np.zeros(100000, dtype="float64")}}
    write_simple_hdf5(z, smooth, chunk=4096, compress=True)
    write_simple_hdf5(r, smooth)
    assert _os.path.getsize(z) < _os.path.getsize(r) / 4
    # shuffle+gzip beats gzip alone on slowly-varying numeric data
    # (the filter's whole point: high bytes become long runs)
    ramp = {"g": {"x": (np.arange(100000) * 1e-3).astype("float64")}}
    zs = str(tmp_path / "zs.h5")
    zp = str(tmp_path / "zp.h5")
    write_simple_hdf5(zs, ramp, chunk=4096, compress=True, shuffle=True)
    write_simple_hdf5(zp, ramp, chunk=4096, compress=True)
    assert _os.path.getsize(zs) < _os.path.getsize(zp)


def test_chunked_refusals(tmp_path):
    """Unsupported filters refuse NAMING the filter id; compress
    without chunk refuses."""
    with pytest.raises(ValueError, match="require chunk"):
        write_simple_hdf5(
            str(tmp_path / "x.h5"),
            {"g": {"a": np.zeros(4)}}, compress=True,
        )
    # hand-corrupt the frozen sample's filter id 1 -> 3 (fletcher32)
    # and expect the loud refusal naming it (shuffle, id 2, is now a
    # SUPPORTED filter — see test_chunked_matches_contiguous_decode)
    import struct as _struct

    buf = bytearray(open(CHUNKED, "rb").read())
    pat = _struct.pack("<BB6xHHHH", 1, 1, 1, 0, 1, 1)
    at = bytes(buf).find(pat)
    assert at != -1
    buf[at + 8:at + 10] = _struct.pack("<H", 3)
    bad = str(tmp_path / "bad.h5")
    open(bad, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="filter id 3"):
        read_hdf5_group(bad, "catalog")
    # shuffle without chunk refuses like compress without chunk
    with pytest.raises(ValueError, match="require chunk"):
        write_simple_hdf5(str(tmp_path / "s.h5"),
                          {"g": {"a": np.zeros(4)}}, shuffle=True)


STRINGS = os.path.join(
    os.path.dirname(__file__), "data", "sample_catalog_strings.hdf5"
)


def test_reader_decodes_frozen_strings_sample():
    """Round-9 verdict #7: variable-length string datasets (class-9
    vlen descriptors + global-heap collections).  The committed binary
    sample pins the reader contract against STORED bytes — string and
    numeric columns side by side, empty string and non-ASCII
    included."""
    df = read_hdf5_group(STRINGS, "catalog")
    assert list(df.columns) == ["halo_id", "name", "ra", "survey"]
    assert df["halo_id"].tolist() == [101, 202, 303, 404]
    assert df["name"].tolist() == ["halo-a", "", "cluster β", "x" * 40]
    assert df["survey"].tolist() == ["deep", "wide", "deep", "wide"]
    assert df["ra"].tolist() == [10.5, 20.25, 30.125, 359.9375]


def test_vlen_strings_round_trip_and_h5py_differential(tmp_path):
    """Writer -> reader round trip for vlen strings (many rows so the
    global-heap collection exceeds one 4096-byte minimum block is NOT
    required — one collection holds them; sizes vary 0..100 chars);
    when h5py is installed the same bytes must parse identically
    (env-gated, the hdf5lite differential discipline)."""
    vals = ["s%d-%s" % (i, "ab" * (i % 50)) for i in range(200)]
    vals[7] = ""
    vals[13] = "ünïcodé-β"
    p = str(tmp_path / "vl.hdf5")
    write_simple_hdf5(p, {"g": {
        "s": np.array(vals, dtype=object),
        "k": np.arange(200, dtype=np.int64),
    }})
    df = read_hdf5_group(p, "g")
    assert df["s"].tolist() == vals
    assert df["k"].tolist() == list(range(200))
    try:
        import h5py
    except ImportError:
        return
    with h5py.File(p, "r") as f:  # pragma: no cover - needs h5py
        got = [x.decode("utf-8") if isinstance(x, bytes) else str(x)
               for x in f["g"]["s"][...]]
        assert got == vals
        assert f["g"]["k"][...].tolist() == list(range(200))


def test_vlen_string_refusals(tmp_path):
    # non-string element refused at write (NULLs must be encoded
    # upstream)
    with pytest.raises(ValueError, match="non-string"):
        write_simple_hdf5(str(tmp_path / "n.hdf5"), {"g": {
            "s": np.array(["a", None], dtype=object)}})
    # a vlen SEQUENCE whose base type is a STRING is outside the
    # sequence subset (sequences carry the numeric base types) — built
    # by flipping a written vlen-string's bit-field type nibble
    # (string=1 -> sequence=0), which leaves the class-3 base behind
    p = str(tmp_path / "seq.hdf5")
    write_simple_hdf5(p, {"g": {"s": np.array(["ab"], dtype=object)}})
    with open(p, "rb") as f:
        raw = bytearray(f.read())
    sig = bytes([(1 << 4) | 9, 0x01])
    at = raw.index(sig)
    raw[at + 1] = 0x00
    bad = str(tmp_path / "seq2.hdf5")
    with open(bad, "wb") as f:
        f.write(raw)
    with pytest.raises(ValueError, match="sequence base type"):
        read_hdf5_group(bad, "g")


def test_read_hdf5_directory_with_string_column(spark, tmp_path):
    """O2 ingest end-to-end with a string column in the declared
    schema — the real-catalog shape the round-9 extension exists
    for."""
    from cosmap_spark.sources.readers import read_hdf5_directory

    for i, (ids, names) in enumerate((
        ([1, 2], ["alpha", "beta"]), ([3], ["gamma"]),
    )):
        write_simple_hdf5(
            str(tmp_path / f"part{i}.hdf5"),
            {"catalog": {
                "halo_id": np.array(ids, dtype=np.int64),
                "name": np.array(names, dtype=object),
            }},
        )
    df = read_hdf5_directory(
        spark, str(tmp_path), "halo_id long, name string",
        dataset_key="catalog",
    )
    got = sorted((r["halo_id"], r["name"]) for r in df.collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_compound_round_trip_and_padding(tmp_path):
    """Class-6 COMPOUND datasets (round-10: the recarray catalog
    layout): writer→reader round trip for a packed structured array
    AND an offset-padded one (alignment gaps between members — what
    h5py writes for aligned dtypes); members surface as bare columns
    next to plain datasets; name collisions and the unsupported
    shapes refuse loudly."""
    p = str(tmp_path / "c.hdf5")
    rec = np.zeros(4, dtype=[("halo_id", "<i8"), ("ra", "<f8"),
                             ("n_sub", "<i4"), ("mass", "<f4")])
    rec["halo_id"] = [11, 22, 33, 44]
    rec["ra"] = [1.5, 2.25, 3.125, 359.9]
    rec["n_sub"] = [3, 1, 4, 1]
    rec["mass"] = [0.5, 1.5, 2.5, 3.5]
    extra = np.array([7.0, 8.0, 9.0, 10.0])
    write_simple_hdf5(p, {"catalog": {"table": rec, "z": extra}})
    df = read_hdf5_group(p, "catalog")
    assert sorted(df.columns) == ["halo_id", "mass", "n_sub", "ra", "z"]
    assert df["halo_id"].tolist() == [11, 22, 33, 44]
    assert df["ra"].tolist() == [1.5, 2.25, 3.125, 359.9]
    assert df["n_sub"].tolist() == [3, 1, 4, 1]
    assert df["mass"].tolist() == [0.5, 1.5, 2.5, 3.5]
    assert df["z"].tolist() == [7.0, 8.0, 9.0, 10.0]
    assert [str(df[c].dtype) for c in
            ["halo_id", "ra", "n_sub", "mass"]] == [
        "int64", "float64", "int32", "float32",
    ]

    # offset-padded dtype: an i4 member followed by an 8-aligned f8
    # leaves a 4-byte gap; offsets and itemsize must round-trip
    padded = np.dtype({"names": ["a", "b"], "formats": ["<i4", "<f8"],
                       "offsets": [0, 8], "itemsize": 16})
    rec2 = np.zeros(3, dtype=padded)
    rec2["a"] = [1, 2, 3]
    rec2["b"] = [0.25, 0.5, 0.75]
    p2 = str(tmp_path / "pad.hdf5")
    write_simple_hdf5(p2, {"g": {"t": rec2}})
    df2 = read_hdf5_group(p2, "g")
    assert df2["a"].tolist() == [1, 2, 3]
    assert df2["b"].tolist() == [0.25, 0.5, 0.75]

    # refusals: chunked compound (writer), unsupported member dtype,
    # member/dataset column collision (reader)
    with pytest.raises(ValueError, match="chunked"):
        write_simple_hdf5(str(tmp_path / "x1.hdf5"),
                          {"g": {"t": rec}}, chunk=2)
    bad = np.zeros(2, dtype=[("s", "S4")])
    with pytest.raises(ValueError, match="unsupported"):
        write_simple_hdf5(str(tmp_path / "x2.hdf5"), {"g": {"t": bad}})
    p3 = str(tmp_path / "x3.hdf5")
    write_simple_hdf5(p3, {"g": {"t": rec2, "a": extra[:3]}})
    with pytest.raises(ValueError, match="more than once"):
        read_hdf5_group(p3, "g")


def test_read_hdf5_directory_with_compound_column(spark, tmp_path):
    """O2 ingest end-to-end over a compound-dataset file: the declared
    schema projects the EXPANDED member columns through mapInPandas."""
    from cosmap_spark.sources.readers import read_hdf5_directory

    rec = np.zeros(5, dtype=[("halo_id", "<i8"), ("mass", "<f8")])
    rec["halo_id"] = np.arange(5)
    rec["mass"] = np.arange(5) * 1.5
    write_simple_hdf5(str(tmp_path / "part0.hdf5"),
                      {"catalog": {"table": rec}})
    got = read_hdf5_directory(
        spark, str(tmp_path), "halo_id long, mass double",
        dataset_key="catalog",
    )
    rows = sorted((r["halo_id"], r["mass"]) for r in got.collect())
    assert rows == [(i, i * 1.5) for i in range(5)]


VLEN_SEQ = os.path.join(os.path.dirname(__file__), "data",
                        "sample_catalog_vlen.hdf5")


def test_vlen_sequences_round_trip(tmp_path):
    """Round-10: class-9 vlen SEQUENCE datasets (the
    ``h5py.vlen_dtype(np.float64)`` ragged-array layout — per-row
    embeddings in a catalog).  Writer→reader round trip for float64
    and int32 base types, ragged lengths, an EMPTY cell (the null
    descriptor), next to plain and string columns."""
    p = str(tmp_path / "v.hdf5")
    emb = np.empty(4, dtype=object)
    emb[0] = np.array([0.5, -1.25, 3.0])
    emb[1] = np.array([], dtype=np.float64)
    emb[2] = np.array([2.0])
    emb[3] = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    hits = np.empty(4, dtype=object)
    for i, v in enumerate(([1, 2], [3], [], [7, 8, 9])):
        hits[i] = np.array(v, dtype=np.int32)
    write_simple_hdf5(p, {"catalog": {
        "halo_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "name": np.array(["a", "b", "c", "d"], dtype=object),
        "emb": emb,
        "hits": hits,
    }})
    df = read_hdf5_group(p, "catalog")
    assert [list(x) for x in df["emb"]] == [
        [0.5, -1.25, 3.0], [], [2.0], [1.0, 2.0, 3.0, 4.0, 5.0]]
    assert df["emb"][0].dtype == np.float64
    assert [list(x) for x in df["hits"]] == [[1, 2], [3], [], [7, 8, 9]]
    assert df["hits"][0].dtype == np.int32
    assert df["name"].tolist() == ["a", "b", "c", "d"]


def test_vlen_sequence_refusals(tmp_path):
    """Mixed str/sequence cells and unsupported base dtypes refuse
    loudly at write time."""
    mixed = np.empty(2, dtype=object)
    mixed[0] = np.array([1.0])
    mixed[1] = "not a sequence"
    with pytest.raises(ValueError, match="mixes sequence"):
        write_simple_hdf5(str(tmp_path / "m.hdf5"),
                          {"g": {"c": mixed}})
    bad = np.empty(1, dtype=object)
    bad[0] = np.array([1 + 2j])
    with pytest.raises(ValueError, match="base dtype"):
        write_simple_hdf5(str(tmp_path / "b.hdf5"), {"g": {"c": bad}})


def test_reader_decodes_frozen_vlen_sequence_sample():
    """The committed binary sample pins the vlen-sequence reader
    contract against STORED bytes (ragged float64 embeddings with an
    empty cell beside id/string columns)."""
    df = read_hdf5_group(VLEN_SEQ, "catalog")
    assert list(df.columns) == ["emb", "halo_id", "tag"]
    assert df["halo_id"].tolist() == [11, 22, 33]
    assert df["tag"].tolist() == ["p", "q", "r"]
    assert [list(x) for x in df["emb"]] == [
        [1.5, 2.5], [], [-0.25, 0.75, 9.0]]


def test_read_hdf5_directory_with_vlen_sequence_column(spark, tmp_path):
    """O2 ingest end-to-end with a ragged array column declared as
    array<double> — the embeddings-in-catalog shape; the object-array
    cells flow through the Arrow mapInPandas boundary as list values."""
    from cosmap_spark.sources.readers import read_hdf5_directory

    for i, (ids, embs) in enumerate((
        ([1, 2], [[0.5, 1.5], []]), ([3], [[9.0]]),
    )):
        col = np.empty(len(embs), dtype=object)
        for j, e in enumerate(embs):
            col[j] = np.array(e, dtype=np.float64)
        write_simple_hdf5(
            str(tmp_path / f"part{i}.hdf5"),
            {"catalog": {
                "halo_id": np.array(ids, dtype=np.int64),
                "emb": col,
            }},
        )
    df = read_hdf5_directory(
        spark, str(tmp_path), "halo_id long, emb array<double>",
        dataset_key="catalog",
    )
    got = sorted((r["halo_id"], list(r["emb"])) for r in df.collect())
    assert got == [(1, [0.5, 1.5]), (2, []), (3, [9.0])]


def test_named_filter_pipeline_parses(tmp_path):
    """The spec permits a NAME on any pipeline filter (8-padded,
    between the header and the client values); the parser must skip it
    to find the client values — reading them at a fixed offset only
    works for the nameless built-ins our writer normally emits.
    Pinned by patching the writer to emit named shuffle+deflate
    filters and requiring a bit-identical decode."""
    import cosmap_spark.sources.hdf5lite as H

    rng = np.random.default_rng(31)
    cols = {"a": (np.arange(300) * 0.5).astype("float64"),
            "b": rng.integers(-99, 99, 300).astype("int32")}
    plain = str(tmp_path / "plain.h5")
    write_simple_hdf5(plain, {"g": cols}, chunk=64, compress=True,
                      shuffle=True)

    real = H._pipeline_msg

    def named(filters, names=None):
        return real(filters, names=["shuffle", "deflate"][:len(filters)])

    H._pipeline_msg = named
    try:
        namedf = str(tmp_path / "named.h5")
        write_simple_hdf5(namedf, {"g": cols}, chunk=64, compress=True,
                          shuffle=True)
    finally:
        H._pipeline_msg = real
    a = read_hdf5_group(plain, "g")
    b = read_hdf5_group(namedf, "g")
    for c in cols:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
