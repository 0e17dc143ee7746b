"""Hyrise binary format tests (BinaryParser/BinaryWriter parity,
src/lib/import_export/binary/). Validated three ways: against the
reference's own .bin fixtures, against the matching .tbl fixture, and by
write/read round-trip."""
from __future__ import annotations

import os

import pytest

from hyrise_spark.sources import read_any, write_any
from hyrise_spark.sources.hybin import read_bin, write_bin

BIN_DIR = "/root/reference/resources/test_data/bin"


def _rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


def test_int_string_fixture_matches_tbl(spark):
    """int_string2.bin decodes to exactly what the .tbl fixture holds."""
    from hyrise_spark.sources.tbl import read_tbl

    got = _rows(read_bin(spark, f"{BIN_DIR}/int_string2.bin"))
    want = _rows(read_tbl(spark, "/root/reference/resources/test_data/tbl/int_string2.tbl"))
    assert got == want == [(123, "A"), (1234, "B"), (12345, "C")]


@pytest.mark.parametrize("family", ["AllTypesMixColumn", "AllTypesNullValues", "AllTypesAllNullValues"])
def test_encodings_decode_identically(spark, family):
    """Unencoded, Dictionary and RunLength files of the same logical table
    must decode to the same rows — cross-validates all three decoders."""
    ref = None
    for enc in ("Unencoded", "Dictionary", "RunLength"):
        rows = _rows(read_bin(spark, f"{BIN_DIR}/{family}/{enc}.bin"))
        if ref is None:
            ref = rows
            assert rows, family
        assert rows == ref, f"{family}/{enc}"


def test_fixed_string_dictionary_with_nulls(spark):
    rows = [r[0] for r in read_bin(spark, f"{BIN_DIR}/FixedStringDictionaryNullValue.bin").collect()]
    assert rows == ["This", "is", "a", None, "test", None]


def test_multiple_chunks_concatenate(spark):
    rows = [r[0] for r in read_bin(spark, f"{BIN_DIR}/FixedStringDictionaryMultipleChunks.bin").collect()]
    assert rows == ["This", "is", "a", "test"]


def test_empty_table(spark):
    df = read_bin(spark, f"{BIN_DIR}/TwoColumnsNoValues.bin")
    assert df.columns == ["FirstColumn", "SecondColumn"]
    assert df.count() == 0


def test_sort_column_definitions_skipped(spark):
    # chunk sort metadata is layout info — parsing must skip it cleanly
    assert read_bin(spark, f"{BIN_DIR}/SortColumnDefinitions.bin").count() == 9


def test_invalid_encoding_raises(spark):
    with pytest.raises((ValueError, NotImplementedError, EOFError)):
        read_bin(spark, f"{BIN_DIR}/InvalidEncodingType.bin").collect()


def test_roundtrip_all_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10**12, 1.5, 2.25, "alpha"), (2, -5, -0.5, 1e10, ""),
         (3, 0, 3.5, -2.5, "görli")],  # non-ascii utf-8
        "i int, l long, f float, d double, s string",
    )
    path = str(tmp_path / "rt.bin")
    write_bin(df, path)
    assert _rows(read_bin(spark, path)) == _rows(df)


def test_roundtrip_nulls_and_chunking(spark, tmp_path):
    rows = [(i, None if i % 3 == 0 else f"s{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "k int, s string")
    path = str(tmp_path / "chunked.bin")
    write_bin(df, path, chunk_size=4)  # forces 3 chunks
    assert _rows(read_bin(spark, path)) == _rows(df)


@pytest.mark.parametrize(
    "name,want",
    [
        ("SingleChunkFrameOfReferenceSegment", [1, 2, 3, 4, 5]),
        ("MultipleChunksFrameOfReferenceSegment", [1, 1, 2, 4, 5]),
        ("NullValuesFrameOfReferenceSegment", [1, None, 2, None, 5]),
        ("AllNullFrameOfReferenceSegment", [None] * 5),
    ],
)
def test_frame_of_reference_fixtures(spark, name, want):
    """The reference's own FoR fixtures decode to the exact rows its
    binary_parser_test.cpp expects (lines 320-352)."""
    assert [r[0] for r in read_bin(spark, f"{BIN_DIR}/{name}.bin").collect()] == want


def test_lz4_multiple_blocks_fixture(spark):
    """LZ4MultipleBlocks.bin: 20000 rows x 5 typed columns through the
    dictionary-assisted multi-block LZ4 path (binary_parser_test.cpp:247-268)."""
    rows = read_bin(spark, f"{BIN_DIR}/LZ4MultipleBlocks.bin").collect()
    assert len(rows) == 20000
    exp = [
        ("AAAAA", 1, 100, 1.1, 11.1),
        ("BBBBBBBBBB", 2, 200, 2.2, 22.2),
        ("CCCCCCCCCCCCCCC", 3, 300, 3.3, 33.3),
        ("DDDDDDDDDDDDDDDDDDDD", 4, 400, 4.4, 44.4),
    ]
    for i in (0, 1, 2, 3, 9998, 19999):
        e = exp[i % 4]
        r = rows[i]
        assert (r[0], r[1], r[2]) == e[:3]
        assert abs(r[3] - e[3]) < 1e-5 and abs(r[4] - e[4]) < 1e-9


def test_lz4_block_decoder_handles_matches_and_dictionary():
    """Hand-crafted LZ4 blocks: a back-reference match, an overlapping match
    (RLE-style), and a match reaching into the prefix dictionary."""
    from hyrise_spark.sources.hybin import _lz4_block_decompress

    # "abcd" literals + match(offset=4, len=4) + final literal "z" -> abcdabcdz
    blk = bytes([0x40]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x10]) + b"z"
    assert _lz4_block_decompress(blk, 9) == b"abcdabcdz"
    # "a" literal + overlapping match(offset=1, len=7) -> "aaaaaaaa"
    blk = bytes([0x13]) + b"a" + bytes([0x01, 0x00]) + bytes([0x00])
    assert _lz4_block_decompress(blk, 8) == b"aaaaaaaa"
    # no literals, match(offset=8, len=5) entirely inside the dictionary
    blk = bytes([0x01]) + bytes([0x08, 0x00]) + bytes([0x00])
    assert _lz4_block_decompress(blk, 5, dictionary=b"HELLOxyz") == b"HELLO"


@pytest.mark.parametrize("encoding", ["for", "lz4", "dictionary", "fsd", "runlength"])
def test_roundtrip_encoded_segments(spark, tmp_path, encoding):
    """Every encoded export reads back identically, nulls included — with
    'dictionary'/'fsd'/'runlength' (round 6) the writer now emits all six
    segment encodings the reference's BinaryWriter produces."""
    rows = [
        (i, None if i % 7 == 0 else i * 1000 + 17, f"s{i}" * (i % 5), float(i) / 3)
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "k int, v int, s string, d double")
    path = str(tmp_path / f"{encoding}.bin")
    write_bin(df, path, chunk_size=2048, encoding=encoding)
    assert _rows(read_bin(spark, path)) == _rows(df)


def test_roundtrip_lz4_empty_strings(spark, tmp_path):
    """All-empty string column: the encoder stores no blocks and drops the
    offsets (lz4_encoder.hpp:142-158) — the decoder must rebuild ''/NULL."""
    df = spark.createDataFrame([(1, ""), (2, None), (3, "")], "k int, s string")
    path = str(tmp_path / "empty.bin")
    write_bin(df, path, encoding="lz4")
    assert _rows(read_bin(spark, path)) == _rows(df)


def test_write_rejects_null_in_non_nullable_column(spark, tmp_path):
    """A NULL inside a declared non-nullable column must raise, not emit a
    null bitmap the segment framing can't represent (parser desync)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType([
        StructField("k", IntegerType(), False),
        StructField("s", StringType(), False),  # declared non-nullable
    ])

    # Spark itself refuses to materialize a null in a non-nullable column, so
    # exercise write_bin's guard through the minimal surface it consumes
    # (schema / columns / collect) — the scenario arrives in practice via
    # schema-lying external sources.
    class _LyingDF:
        def __init__(self):
            self.schema = schema
            self.columns = [f.name for f in schema.fields]

        def collect(self):
            return [(1, "a"), (2, None)]

    with pytest.raises(ValueError, match="non-nullable"):
        write_bin(_LyingDF(), str(tmp_path / "bad.bin"))


def test_read_any_sniffs_hyrise_vs_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "k int, s string")
    hy = str(tmp_path / "native.bin")
    write_any(df, hy)
    assert _rows(read_any(spark, hy)) == [(1, "x")]
    # legacy convention: parquet directory under a .bin name still reads
    pq = str(tmp_path / "legacy.bin")
    df.write.mode("overwrite").parquet(pq)
    assert os.path.isdir(pq)
    assert _rows(read_any(spark, pq)) == [(1, "x")]


def test_engine_import_bin(spark, tmp_path):
    """IMPORT FROM '<file>.bin' routes through the native parser."""
    from hyrise_spark.engine import Engine

    df = spark.createDataFrame([(7, "seven")], "k int, s string")
    path = str(tmp_path / "imp.bin")
    write_bin(df, path)
    engine = Engine(spark)
    engine.execute(f"IMPORT FROM '{path}' INTO bin_imported")
    out = engine.execute("SELECT * FROM bin_imported")
    assert _rows(out) == [(7, "seven")]


def test_write_rejects_unknown_encoding_before_writing(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    path = tmp_path / "bad_enc.bin"
    with pytest.raises(ValueError, match="unknown .bin encoding"):
        write_bin(df, str(path), encoding="LZ4")  # case-sensitive typo
    assert not path.exists()  # no corrupt partial file left behind


def test_dictionary_writer_emits_sorted_dictionary(tmp_path, spark):
    """Byte-level pin of the dictionary segment layout the reference parses
    (binary_parser.cpp dictionary path): encoding id 1, BitPacking attribute
    vector id 0, dict size u32, SORTED distinct values, null id == dict size."""
    import struct

    df = spark.createDataFrame(
        [(3, "b"), (1, "c"), (3, None), (2, "a")], "k int, s string"
    )
    path = str(tmp_path / "dict.bin")
    write_bin(df, path, encoding="dictionary")
    with open(path, "rb") as f:
        data = f.read()
    # skip header: chunk_size u32 | chunk_count u32 | col_count u16
    off = 10
    # string arrays are written as ALL u64 lengths then concatenated chars
    for _ in range(2):  # column type strings, then (after nullables) names
        lens = struct.unpack_from("<QQ", data, off)
        off += 16 + sum(lens)
        if _ == 0:
            off += 2  # nullable bytes between types and names
    off += 8  # chunk row_count u32 + sorted_column_count u32
    # --- int column segment ---
    enc, cv = struct.unpack_from("<BB", data, off); off += 2
    assert (enc, cv) == (1, 0)
    (dict_size,) = struct.unpack_from("<I", data, off); off += 4
    assert dict_size == 3
    import numpy as np
    dict_vals = np.frombuffer(data, "<i4", count=3, offset=off).tolist(); off += 12
    assert dict_vals == [1, 2, 3]  # sorted
    (bits,) = struct.unpack_from("<B", data, off); off += 1
    assert bits == 2  # ids 0..3 (3 = null id) need 2 bits
    off += 8  # one u64 word holds 4x2 bits
    # --- string column segment ---
    enc, cv = struct.unpack_from("<BB", data, off); off += 2
    assert (enc, cv) == (1, 0)
    (dict_size,) = struct.unpack_from("<I", data, off); off += 4
    assert dict_size == 3  # 'a','b','c' (NULL not in dictionary)
    lens = np.frombuffer(data, "<u8", count=3, offset=off).tolist(); off += 24
    assert lens == [1, 1, 1]
    assert data[off:off + 3] == b"abc"  # sorted
    # round-trip proves the attribute vector maps back (incl. null id)
    assert _rows(read_bin(spark, path)) == _rows(df)


def test_fsd_writer_rejects_trailing_nul(tmp_path, spark):
    df = spark.createDataFrame([(1, "x\x00")], "k int, s string")
    with pytest.raises(Exception, match="trailing NUL"):
        write_bin(df, str(tmp_path / "bad.bin"), encoding="fsd")


def test_runlength_writer_compresses_runs(tmp_path, spark):
    """A constant column becomes ONE run; alternating nulls become separate
    runs; inclusive end offsets rebuild exact lengths."""
    import struct

    rows = [(i, "const", None if i < 10 else 5) for i in range(20)]
    df = spark.createDataFrame(rows, "k int, s string, v int")
    path = str(tmp_path / "rl.bin")
    write_bin(df, path, encoding="runlength")
    assert _rows(read_bin(spark, path)) == _rows(df)
    data = open(path, "rb").read()
    # the 's' column's segment: find the run count by scanning is overkill —
    # instead assert total file size is far below unencoded (20 copies of
    # 'const' collapse to one run value)
    df_un = spark.createDataFrame(rows, "k int, s string, v int")
    path_un = str(tmp_path / "un.bin")
    write_bin(df_un, path_un, encoding="unencoded")
    assert len(data) < len(open(path_un, "rb").read())
