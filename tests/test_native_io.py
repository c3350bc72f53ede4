"""Native IO runtime: TFRecord reader vs tf-written shards (bytes exact,
crc verified), corrupt-record skipping, masked-crc32c golden vs TF's
implementation, and libjpeg decode parity with tf.io.decode_jpeg."""

import os
import struct

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.data import native_io


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("tfr")
    rng = np.random.default_rng(0)
    records = {}
    paths = []
    for s in range(3):
        p = str(d / f"data-{s:05d}-of-00003.tfrecord")
        paths.append(p)
        with tf.io.TFRecordWriter(p) as w:
            recs = [rng.bytes(rng.integers(10, 2000)) for _ in range(20)]
            for r in recs:
                w.write(r)
            records[p] = recs
    return paths, records


def test_reader_reads_all_records_exactly(shards):
    paths, records = shards
    got = sorted(native_io.TFRecordReader(paths, num_threads=2))
    want = sorted(b for recs in records.values() for b in recs)
    assert got == want


def test_reader_single_thread_preserves_shard_order(shards):
    paths, records = shards
    got = list(native_io.TFRecordReader(paths[:1], num_threads=1))
    assert got == records[paths[0]]


@pytest.mark.skipif(not native_io.native_available(), reason="no toolchain")
def test_masked_crc_matches_tfrecord_framing(shards):
    """Verify our crc32c against the one TF actually wrote to disk."""
    paths, _ = shards
    with open(paths[0], "rb") as f:
        header = f.read(12)
    (length,) = struct.unpack("<Q", header[:8])
    (len_crc,) = struct.unpack("<I", header[8:12])
    assert native_io.masked_crc32c(header[:8]) == len_crc


@pytest.mark.skipif(not native_io.native_available(), reason="no toolchain")
def test_corrupt_record_is_skipped(tmp_path, shards):
    paths, records = shards
    raw = open(paths[0], "rb").read()
    # flip a byte inside the first record's payload (after 12-byte header)
    corrupted = bytearray(raw)
    corrupted[14] ^= 0xFF
    p = str(tmp_path / "corrupt.tfrecord")
    open(p, "wb").write(bytes(corrupted))
    reader = native_io.TFRecordReader([p], num_threads=1)
    got = list(reader)
    assert len(got) == len(records[paths[0]]) - 1
    assert reader.crc_errors() >= 1


@pytest.mark.skipif(not native_io.native_available(), reason="no toolchain")
def test_jpeg_decode_matches_tf(shards):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(37, 53, 3), dtype=np.uint8)
    encoded = tf.io.encode_jpeg(img).numpy()
    ours = native_io.decode_jpeg(encoded)
    tfs = tf.io.decode_jpeg(encoded, channels=3).numpy()
    assert ours.shape == tfs.shape == (37, 53, 3)
    # libjpeg IDCT variants may differ by a couple of levels per pixel
    assert np.mean(np.abs(ours.astype(int) - tfs.astype(int))) < 2.0
    assert np.max(np.abs(ours.astype(int) - tfs.astype(int))) <= 20


def test_python_fallback_iterates(shards):
    paths, records = shards
    got = list(native_io._py_tfrecord_iter(paths[:1], verify_crc=False))
    assert got == records[paths[0]]
