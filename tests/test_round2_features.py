"""Round-2 feature tests: quotas, corrupt/missing accounting, lease
recovery + append, real BMP/WAV decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from adfs_spark.functions.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    extract_features,
    is_bmp,
    is_wav,
    resize_images,
    resize_nearest,
)
from adfs_spark.namespace import Namespace, NamespaceError
from adfs_spark.schema import BLOCK, DATANODE, LEASE
from adfs_spark.storage import VersionedTable


# -- codecs (pure functions, no Spark) -------------------------------------


def _checker(w=8, h=6):
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[::2, ::2] = [255, 0, 0]
    rgb[1::2, 1::2] = [0, 255, 0]
    rgb[0, 0] = [1, 2, 3]
    return rgb


def test_bmp_roundtrip():
    rgb = _checker()
    payload = encode_bmp(rgb)
    assert is_bmp(payload)
    back = decode_bmp(payload)
    assert back.shape == rgb.shape and (back == rgb).all()


def test_bmp_resize_nearest():
    rgb = _checker(8, 6)
    out = resize_nearest(rgb, 4, 3)
    assert out.shape == (3, 4, 3)
    assert (out[0, 0] == rgb[0, 0]).all()


def _wav_bytes(rate=8000, n=800):
    import struct

    t = np.arange(n) / rate
    x = (np.sin(2 * np.pi * 440 * t) * 30000).astype("<i2")
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def test_wav_decode():
    payload = _wav_bytes()
    assert is_wav(payload)
    rate, x = decode_wav(payload)
    assert rate == 8000 and len(x) == 800
    assert abs(float(np.max(x)) - 30000 / 32768) < 1e-3


def test_extract_features_real_decode(spark):
    bmp = encode_bmp(_checker())
    wav = _wav_bytes()
    other = b"not-an-image"
    media = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(other))],
        "media_id: long, payload: binary",
    )
    rows = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
    assert rows[1]["decoded"] and rows[2]["decoded"] and not rows[3]["decoded"]
    # BMP features lead with (width, height)
    assert rows[1]["feature"][0] == 8.0 and rows[1]["feature"][1] == 6.0
    # WAV features lead with duration_s = 800/8000
    assert abs(rows[2]["feature"][0] - 0.1) < 1e-6


def test_resize_images_real(spark):
    bmp = encode_bmp(_checker(8, 6))
    media = spark.createDataFrame(
        [(1, bytearray(bmp), None)],
        "media_id: long, payload: binary, meta: struct<modality:string,mime:string,width:int,height:int,duration_ms:bigint>",
    )
    out = resize_images(media, 4, 3).collect()[0]
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 3
    resized = decode_bmp(bytes(out["payload"]))
    assert resized.shape == (3, 4, 3)


# -- quotas ------------------------------------------------------------------


@pytest.fixture()
def ns(spark, tmp_path):
    return Namespace.create_at(spark, str(tmp_path / "fs"))


def test_quota_set_and_report(ns):
    ns.mkdirs("/proj")
    ns.set_quota("/proj", ns_quota=3, ds_quota=100)
    ns.create("/proj/a")
    ns.complete_file("/proj/a", 40)
    usage = ns.quota_usage("/proj")
    assert usage["nsQuota"] == 3 and usage["nsUsed"] == 1
    assert usage["dsQuota"] == 100 and usage["dsUsed"] == 40
    assert not usage["nsExceeded"] and not usage["dsExceeded"]


def test_quota_ns_enforced(ns):
    ns.mkdirs("/cap")
    ns.set_quota("/cap", ns_quota=2)
    ns.create("/cap/a")
    ns.create("/cap/b")
    with pytest.raises(NamespaceError, match="nsQuota exceeded"):
        ns.create("/cap/c")
    # quota applies to the subtree, including nested dirs
    with pytest.raises(NamespaceError, match="nsQuota exceeded"):
        ns.mkdirs("/cap/sub")


def test_quota_ds_enforced_on_complete(ns):
    ns.mkdirs("/disk")
    ns.set_quota("/disk", ds_quota=50)
    ns.create("/disk/f")
    ns.complete_file("/disk/f", 50)  # exactly at quota: fine
    ns.create("/disk/g")
    with pytest.raises(NamespaceError, match="dsQuota exceeded"):
        ns.complete_file("/disk/g", 1)


def test_quota_dir_only_and_clear(ns):
    ns.create("/f")
    with pytest.raises(NamespaceError):
        ns.set_quota("/f", ns_quota=1)
    ns.mkdirs("/d")
    ns.set_quota("/d", ns_quota=1)
    ns.set_quota("/d", ns_quota=-1)  # clear
    ns.create("/d/x")
    ns.create("/d/y")  # no longer capped


# -- lease recovery / append -------------------------------------------------


def test_recover_lease(ns):
    ns.create("/w", lease_holder="client-1")
    info = ns.get_file_info("/w")
    assert info["leaseHolder"] == "client-1"
    ns.recover_lease("/w", final_length=123, now_ms=999_000)
    info = ns.get_file_info("/w")
    assert info["leaseHolder"] is None
    assert info["length"] == 123 and info["leaseRecoveryTime"] == 999_000
    # not under construction anymore → recovery refuses
    with pytest.raises(NamespaceError, match="not under construction"):
        ns.recover_lease("/w", final_length=1)


def test_append_reacquires_lease(ns):
    ns.create("/log", lease_holder="c1")
    ns.complete_file("/log", 10)
    fid = ns.append_file("/log", "c2")
    info = ns.get_file_info("/log")
    assert info["id"] == fid and info["leaseHolder"] == "c2"
    with pytest.raises(NamespaceError, match="already under construction"):
        ns.append_file("/log", "c3")


# -- corrupt / missing accounting ---------------------------------------------


@pytest.fixture()
def blockmap(spark, tmp_path, ns):
    from adfs_spark.blockmap import BlockMap

    blocks = VersionedTable(spark, BLOCK, str(tmp_path / "blocks"))
    dns = VersionedTable(spark, DATANODE, str(tmp_path / "dns"))
    leases = VersionedTable(spark, LEASE, str(tmp_path / "leases"))
    # block 1: replicas on dn 1/2; dn2's replica has a stale genstamp
    # block 2: replicas on dn 1/3 agree; dn3 is dead
    # block 3: single replica on dn3 (dead) → missing
    blocks.init(
        spark.createDataFrame(
            [
                (1, 1, 100, 5, 10, 0),
                (1, 2, 100, 4, 10, 0),
                (2, 1, 200, 7, 10, 1),
                (2, 3, 200, 7, 10, 1),
                (3, 3, 300, 2, 11, 0),
            ],
            BLOCK.struct_type(include_version=False),
        )
    )
    now = 1_000_000
    dns.init(
        spark.createDataFrame(
            [
                (1, "dn1", "s1", 0, 0, 0, 0, 0, now, 0, "r1", "LIVE"),
                (2, "dn2", "s2", 0, 0, 0, 0, 0, now, 0, "r1", "LIVE"),
                (3, "dn3", "s3", 0, 0, 0, 0, 0, now - 10_000_000, 0, "r2", "LIVE"),
            ],
            DATANODE.struct_type(include_version=False),
        )
    )
    leases.init(spark.createDataFrame([], LEASE.struct_type(include_version=False)))
    return BlockMap(ns, blocks, dns, leases)


def test_corrupt_replicas(blockmap):
    rows = {(r["id"], r["datanodeId"]): r["reason"] for r in blockmap.corrupt_replicas().collect()}
    assert rows == {(1, 2): "genstamp"}
    assert blockmap.corrupt_blocks_count() == 1


def test_missing_blocks(blockmap):
    missing = sorted(r["id"] for r in blockmap.missing_blocks(now_ms=1_000_000).collect())
    assert missing == [3]
    assert blockmap.missing_blocks_count(now_ms=1_000_000) == 1


def test_classify_report(blockmap, spark):
    # dn1 reports: block 1 ok, block 2 with bad length, new block 9;
    # stored block 2 on dn1 → corrupt, block 9 → added, nothing removed?
    # it also drops nothing; dn1 stores blocks 1 and 2.
    reported = spark.createDataFrame(
        [(1, 100, 5), (2, 999, 7), (9, 50, 1)], "id: long, length: long, generationStamp: long"
    )
    got = {r["id"]: r["class"] for r in blockmap.classify_report(1, reported).collect()}
    assert got == {1: "ok", 2: "corrupt", 9: "added"}
