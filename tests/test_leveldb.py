"""Clean-room LevelDB format codec (utils/leveldb_fmt.py) + db backend.

Checked against public, implementation-independent anchors: the crc32c
check value from the CRC catalogue, leveldb's documented mask constant
behavior, the libsnappy C library (present in this image) vs our
pure-Python decoder, and structural invariants of the documented file
formats.  VERDICT r1 Missing #5 / Next #7."""

import os
import struct

import numpy as np
import pytest

from caffe_rtpose_tpu.utils import leveldb_fmt as ldb
from caffe_rtpose_tpu.utils.db import convert_db, open_db


class TestPrimitives:
    def test_crc32c_check_vector(self):
        # CRC-32C("123456789") = 0xE3069283 (CRC catalogue check value)
        assert ldb.crc32c(b"123456789") == 0xE3069283
        assert ldb.crc32c(b"") == 0

    def test_crc32c_extend_composes(self):
        a, b = b"hello ", b"world"
        assert ldb.crc32c(b, ldb.crc32c(a)) == ldb.crc32c(a + b)

    def test_mask_roundtrip_and_constant(self):
        for v in (0, 1, 0xE3069283, 0xFFFFFFFF):
            assert ldb.crc_unmask(ldb.crc_mask(v)) == v
        # leveldb delta constant 0xa282ead8: mask(0) == rot(0)+delta
        assert ldb.crc_mask(0) == 0xA282EAD8

    def test_varint_roundtrip(self):
        buf = bytearray()
        vals = [0, 1, 127, 128, 300, 2**21, 2**35 + 7]
        for v in vals:
            ldb.put_varint(buf, v)
        off = 0
        for v in vals:
            got, off = ldb.get_varint(bytes(buf), off)
            assert got == v

    def test_snappy_lib_vs_pure_python(self):
        """Compress with the real libsnappy (ctypes), decompress with the
        pure-Python decoder — cross-implementation check of the decoder."""
        if ldb._SNAPPY is None:
            pytest.skip("libsnappy not present")
        import ctypes

        lib = ldb._SNAPPY
        lib.snappy_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.snappy_max_compressed_length.restype = ctypes.c_size_t
        rng = np.random.RandomState(0)
        for payload in (b"", b"abc", b"a" * 10000,
                        bytes(rng.randint(0, 4, 5000, np.uint8)),
                        b"the quick brown fox " * 300):
            cap = lib.snappy_max_compressed_length(len(payload))
            out = ctypes.create_string_buffer(cap)
            n = ctypes.c_size_t(cap)
            assert lib.snappy_compress(payload, len(payload), out,
                                       ctypes.byref(n)) == 0
            comp = out.raw[: n.value]
            # ctypes path
            assert ldb.snappy_decompress(comp) == payload
            # force the pure-Python path
            saved, ldb._SNAPPY = ldb._SNAPPY, None
            try:
                assert ldb.snappy_decompress(comp) == payload
            finally:
                ldb._SNAPPY = saved


class TestLogFormat:
    def test_roundtrip_with_block_spanning_records(self, tmp_path):
        rng = np.random.RandomState(1)
        recs = [bytes(rng.randint(0, 256, n, np.uint8))
                for n in (0, 1, 100, 32768, 70000, 5)]
        p = str(tmp_path / "x.log")
        ldb.write_log(p, recs)
        assert ldb.read_log(p) == recs
        # first record header sits at offset 0 with a valid masked crc
        raw = open(p, "rb").read()
        crc, ln, t = struct.unpack_from("<IHB", raw, 0)
        assert t == 1 and ln == 0  # FULL, empty record
        assert ldb.crc_unmask(crc) == ldb.crc32c(bytes([1]))

    def test_corrupt_crc_drops_tail(self, tmp_path):
        """leveldb log recovery drops from the first bad-crc fragment on
        (a crash tears the final record mid-write); records before the
        tear survive."""
        p = str(tmp_path / "x.log")
        ldb.write_log(p, [b"first", b"hello"])
        raw = bytearray(open(p, "rb").read())
        raw[7 + 5 + 8] ^= 0xFF  # flip a payload byte of the SECOND record
        open(p, "wb").write(raw)
        assert ldb.read_log(p) == [b"first"]

    def test_write_batch_roundtrip(self):
        ops = [(ldb.TYPE_VALUE, b"k1", b"v1"), (ldb.TYPE_DELETION, b"k2", None),
               (ldb.TYPE_VALUE, b"k3", b"")]
        buf = ldb.encode_write_batch(42, ops)
        seq, got = ldb.decode_write_batch(buf)
        assert seq == 42
        assert got == [(1, b"k1", b"v1"), (0, b"k2", None), (1, b"k3", b"")]


class TestTableFormat:
    def test_roundtrip_multiblock_prefix_compressed(self, tmp_path):
        rng = np.random.RandomState(2)
        entries = []
        for i in range(500):  # shared prefixes exercise restart logic
            k = ldb.internal_key(f"key/{i:06d}".encode(), i + 1,
                                 ldb.TYPE_VALUE)
            entries.append((k, bytes(rng.randint(0, 256, 64, np.uint8))))
        p = str(tmp_path / "000005.ldb")
        size = ldb.write_table(p, entries)
        assert size == os.path.getsize(p)
        assert struct.unpack("<Q", open(p, "rb").read()[-8:])[0] == \
            ldb.TABLE_MAGIC
        got = ldb.read_table(p)
        assert got == entries

    def test_block_crc_detected(self, tmp_path):
        p = str(tmp_path / "t.ldb")
        ldb.write_table(p, [(ldb.internal_key(b"a", 1, 1), b"v")])
        raw = bytearray(open(p, "rb").read())
        raw[0] ^= 0xFF
        open(p, "wb").write(raw)
        with pytest.raises(ValueError, match="crc"):
            ldb.read_table(p)

    def test_internal_key_codec(self):
        ik = ldb.internal_key(b"user", 12345, ldb.TYPE_DELETION)
        assert ldb.parse_internal_key(ik) == (b"user", 12345, 0)


class TestWholeDb:
    def test_compacted_db_roundtrip(self, tmp_path):
        items = [(f"{i:07d}".encode(), f"value-{i}".encode() * 10)
                 for i in range(200)]
        p = str(tmp_path / "db_ldb")
        ldb.write_db(p, items, compact=True)
        assert os.path.exists(os.path.join(p, "CURRENT"))
        assert ldb.read_db(p) == sorted(items)

    def test_log_only_db_roundtrip(self, tmp_path):
        items = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(50)]
        p = str(tmp_path / "db_log")
        ldb.write_db(p, items, compact=False)
        assert ldb.read_db(p) == sorted(items)

    def test_log_overrides_table_and_deletions_drop(self, tmp_path):
        """Newest-sequence-wins across table + log, deletions hide keys."""
        p = str(tmp_path / "db_mix")
        ldb.write_db(p, [(b"a", b"old"), (b"b", b"keep"), (b"c", b"dead")],
                     compact=True)
        # append a live log (log_number=6 per write_db compact layout)
        batches = [ldb.encode_write_batch(100, [
            (ldb.TYPE_VALUE, b"a", b"new"),
            (ldb.TYPE_DELETION, b"c", None),
            (ldb.TYPE_VALUE, b"d", b"added")])]
        ldb.write_log(os.path.join(p, "000006.log"), batches)
        assert ldb.read_db(p) == [(b"a", b"new"), (b"b", b"keep"),
                                  (b"d", b"added")]

    def test_snappy_compressed_table_reads(self, tmp_path):
        """Hand-build a table with a snappy (type 1) block via libsnappy."""
        if ldb._SNAPPY is None:
            pytest.skip("libsnappy not present")
        import ctypes

        lib = ldb._SNAPPY
        lib.snappy_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
        lib.snappy_max_compressed_length.restype = ctypes.c_size_t

        entries = [(ldb.internal_key(b"k%03d" % i, i + 1, 1), b"v" * 100)
                   for i in range(20)]
        bb = ldb._BlockBuilder()
        for k, v in entries:
            bb.add(k, v)
        data = bb.finish()
        cap = lib.snappy_max_compressed_length(len(data))
        out = ctypes.create_string_buffer(cap)
        n = ctypes.c_size_t(cap)
        assert lib.snappy_compress(data, len(data), out, ctypes.byref(n)) == 0
        comp = out.raw[: n.value]

        p = str(tmp_path / "snappy.ldb")
        with open(p, "wb") as f:
            crc = ldb.crc_mask(ldb.crc32c(bytes([1]), ldb.crc32c(comp)))
            f.write(comp + bytes([1]) + struct.pack("<I", crc))
            data_handle = ldb._encode_handle(0, len(comp))
            meta_off = f.tell()
            mb = ldb._BlockBuilder().finish()
            f.write(mb + bytes([0]) + struct.pack(
                "<I", ldb.crc_mask(ldb.crc32c(bytes([0]), ldb.crc32c(mb)))))
            idx_off = f.tell()
            ib = ldb._BlockBuilder()
            ib.add(entries[-1][0], data_handle)
            ibd = ib.finish()
            f.write(ibd + bytes([0]) + struct.pack(
                "<I", ldb.crc_mask(ldb.crc32c(bytes([0]), ldb.crc32c(ibd)))))
            footer = bytearray(ldb._encode_handle(meta_off, len(mb)) +
                               ldb._encode_handle(idx_off, len(ibd)))
            footer += b"\x00" * (40 - len(footer))
            footer += struct.pack("<Q", ldb.TABLE_MAGIC)
            f.write(footer)
        assert ldb.read_table(p) == entries


class TestDbBackend:
    def test_open_db_auto_sniffs_leveldb(self, tmp_path):
        p = str(tmp_path / "snif")
        ldb.write_db(p, [(b"k", b"v")])
        db = open_db(p, "r")
        assert db.backend == "leveldb"
        assert db.get(b"k") == b"v" and len(db) == 1

    def test_write_through_db_api_and_cursor(self, tmp_path):
        p = str(tmp_path / "w_ldb")
        db = open_db(p, "w", backend="leveldb")
        txn = db.new_transaction()
        for i in range(10):
            txn.put(f"{i:03d}", f"val{i}".encode())
        txn.commit()
        db.close()
        db2 = open_db(p, "r", backend="leveldb")
        cur = db2.new_cursor()
        cur.seek_to_first()
        keys = []
        while cur.valid():
            keys.append(cur.key())
            cur.next()
        assert keys == [f"{i:03d}".encode() for i in range(10)]

    def test_db_convert_leveldb_to_kvdb(self, tmp_path):
        src = str(tmp_path / "src_ldb")
        ldb.write_db(src, [(b"a", b"1"), (b"b", b"2"), (b"c", b"3")])
        dst = str(tmp_path / "dst.kvdb")
        assert convert_db(src, dst) == 3
        out = open_db(dst, "r", backend="kvdb")
        assert out.get(b"b") == b"2"

    def test_db_convert_cli(self, tmp_path, capsys):
        from caffe_rtpose_tpu.tools.aux_tools import main

        src = str(tmp_path / "cli_ldb")
        ldb.write_db(src, [(b"x", b"y")])
        dst = str(tmp_path / "out.kvdb")
        assert main(["db_convert", src, dst]) == 0
        assert "Copied 1 records" in capsys.readouterr().out

    def test_cpm_datum_source_over_leveldb(self, tmp_path):
        """A reference-format CPM training dataset in LevelDB trains
        directly (ties VERDICT Next #3 and #7 together)."""
        from caffe_rtpose_tpu.proto.datum import serialize_datum
        from caffe_rtpose_tpu.training.cpm_lmdb import (
            CpmDatumSource, RecordInfo, encode_cpm_datum)
        from caffe_rtpose_tpu.training.transformer import Meta, Person

        rng = np.random.RandomState(3)
        joints = np.stack([rng.uniform(5, 90, 17),
                           rng.uniform(5, 80, 17)], 1).astype(np.float32)
        meta = Meta(people=[Person(joints=joints,
                                   visible=np.ones(17, np.int32),
                                   objpos=np.array([48., 44.], np.float32))],
                    scale_self=1.0)
        img = rng.randint(0, 256, (88, 96, 3), np.uint8)
        datum = encode_cpm_datum(img, meta, info=RecordInfo())
        p = str(tmp_path / "cpm_ldb")
        ldb.write_db(p, [(b"0000000", serialize_datum(datum))])

        src = CpmDatumSource(p, backend="leveldb")
        assert len(src) == 1
        got_img, got_meta, _ = src[0]
        np.testing.assert_array_equal(got_img, img)
        # TransformJoints np==56 resizes joints to np with the first 18
        # filled, like the reference (training/joints.py)
        assert got_meta.main.joints.shape == (56, 2)
        assert np.abs(got_meta.main.joints[:18]).sum() > 0


def test_convert_imageset_leveldb_backend(tmp_path, capsys):
    """convert_imageset --backend leveldb (reference convert_imageset.cpp
    --backend flag) writes a LevelDB of Datum records readable end to end."""
    import cv2

    from caffe_rtpose_tpu.proto.datum import datum_to_array, parse_datum
    from caffe_rtpose_tpu.tools.aux_tools import main

    rng = np.random.RandomState(6)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    lines = []
    for i in range(3):
        img = rng.randint(0, 256, (10, 12, 3), np.uint8)
        cv2.imwrite(str(imgdir / f"im{i}.png"), img)
        lines.append(f"im{i}.png {i}")
    listfile = tmp_path / "list.txt"
    listfile.write_text("\n".join(lines))

    out = str(tmp_path / "imgs_leveldb")
    assert main(["convert_imageset", str(listfile), str(imgdir), out,
                 "--backend", "leveldb"]) == 0
    db = open_db(out, "r")
    assert db.backend == "leveldb" and len(db) == 3
    d = parse_datum(db.get(b"00000000_im0.png"))
    assert d["label"] == 0
    assert datum_to_array(d).shape == (3, 10, 12)


class TestAppendAndLazy:
    """O(delta) append commits + crash-log recovery + lazy value index
    (review findings: commits must not rewrite the DB; recovery must
    replay logs newer than the manifest's log_number; values must not be
    resident)."""

    def test_append_db_is_delta_and_preserves_table(self, tmp_path):
        p = str(tmp_path / "db_app")
        base = [(f"{i:04d}".encode(), b"v" * 100) for i in range(100)]
        ldb.write_db(p, base, compact=True)
        table = os.path.join(p, "000005.ldb")
        before = open(table, "rb").read()
        for round_ in range(3):
            ldb.append_db(p, [(ldb.TYPE_VALUE,
                               f"new{round_}".encode(), b"nv")])
        assert open(table, "rb").read() == before  # table untouched
        got = dict(ldb.read_db(p))
        assert got[b"new0"] == got[b"new2"] == b"nv"
        assert got[b"0042"] == b"v" * 100

    def test_recovery_replays_newer_logs(self, tmp_path):
        """A log file with a number above the manifest's log_number (crash
        before a MANIFEST update) must still be replayed."""
        p = str(tmp_path / "db_crash")
        ldb.write_db(p, [(b"a", b"1")], compact=True)  # log_number=6
        ldb.write_log(os.path.join(p, "000008.log"),
                      [ldb.encode_write_batch(50, [
                          (ldb.TYPE_VALUE, b"z", b"late")])])
        assert dict(ldb.read_db(p))[b"z"] == b"late"

    def test_lazy_db_matches_full_read(self, tmp_path):
        p = str(tmp_path / "db_lazy")
        items = [(f"{i:05d}".encode(), (f"val{i}" * 9).encode())
                 for i in range(300)]
        ldb.write_db(p, items, compact=True)
        ldb.append_db(p, [(ldb.TYPE_VALUE, b"00042", b"newer"),
                          (ldb.TYPE_VALUE, b"extra", b"fromlog")])
        lazy = ldb.LazyDb(p)
        full = ldb.read_db(p)
        assert lazy.keys() == [k for k, _ in full]
        for pos in (0, 42, 150, len(full) - 1):
            assert lazy.value(pos) == full[pos][1]

    def test_db_api_append_commits(self, tmp_path):
        """open_db('w') over an existing LevelDB: repeated transactions
        append; a fresh handle sees the merged state."""
        from caffe_rtpose_tpu.utils.db import open_db

        p = str(tmp_path / "db_api")
        ldb.write_db(p, [(b"base", b"0")], compact=True)
        db = open_db(p, "w", backend="leveldb")
        for i in range(3):
            txn = db.new_transaction()
            txn.put(f"k{i}".encode(), f"v{i}".encode())
            txn.commit()
        assert db.get(b"k1") == b"v1"
        assert db.get(b"base") == b"0"
        db.close()
        db2 = open_db(p, "r", backend="leveldb")
        assert len(db2) == 4
        assert db2.get(b"k2") == b"v2"
        db2.close()


class TestTornTail:
    """Crash-mid-commit behavior (review finding): an append after a torn
    log tail must not be lost to recovery or corrupt the DB."""

    def _torn_db(self, tmp_path):
        p = str(tmp_path / "db_torn")
        ldb.write_db(p, [(b"base", b"0")], compact=True)
        ldb.append_db(p, [(ldb.TYPE_VALUE, b"ok", b"1")])
        # tear the tail: append a record then truncate mid-payload
        ldb.append_db(p, [(ldb.TYPE_VALUE, b"lost", b"x" * 100)])
        log = os.path.join(p, "000006.log")
        sz = os.path.getsize(log)
        with open(log, "ab") as f:
            f.truncate(sz - 40)
        return p

    def test_append_after_tear_survives_reopen(self, tmp_path):
        p = self._torn_db(tmp_path)
        ldb.append_db(p, [(ldb.TYPE_VALUE, b"after", b"2")])
        got = dict(ldb.read_db(p))
        assert got[b"base"] == b"0" and got[b"ok"] == b"1"
        assert got[b"after"] == b"2"      # post-crash commit is durable
        assert b"lost" not in got         # torn record dropped, not fatal
        # the new batch went to a FRESH log, not after the tear
        assert os.path.exists(os.path.join(p, "000007.log"))

    def test_lazy_db_single_table_block_cache(self, tmp_path):
        """Values come from ~4KB block decodes, not a whole-table load
        (single-table DBs are what write_db emits)."""
        p = str(tmp_path / "db_blocks")
        items = [(b"%06d" % i, bytes([i % 256]) * 3000) for i in range(64)]
        ldb.write_db(p, items, compact=True)
        lazy = ldb.LazyDb(p)
        assert lazy.value(63) == items[63][1]
        assert lazy.value(0) == items[0][1]
        # cache holds blocks, each far smaller than the table
        assert len(lazy._cache) >= 1
        for entries in lazy._cache.values():
            assert len(entries) < len(items)
