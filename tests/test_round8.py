"""Round-8 regression tests — one per ADVICE defect.

1. gofish_audit batch append must STACK commits, not silently replace
   the previous one (ADVICE r07, medium — `sources/pyds.py`).
2. BMP headers with non-positive dimensions must take the
   'unsupported' path, never report negative n_pixels (ADVICE r07, low
   — `operators/multimodal.py`).
3. quota_apportion must enforce its documented k ≤ total precondition
   loudly instead of emitting unfillable quotas (ADVICE r07, low —
   `operators/sampling.py`).
"""

import glob
import json
import struct

import pytest


def test_audit_sink_append_stacks_commits(spark, tmp_path):
    """Two mode('append') saves publish under distinct suffixes and the
    directory holds BOTH commits' rows; mode('overwrite') then clears
    everything previously published and leaves only its own commit."""
    from go_fish_spark.sources import pyds

    pyds.register_sink(spark)
    pyds.register(spark)
    out = str(tmp_path / "audit_append")

    def read_all():
        return [
            json.loads(l)
            for f in glob.glob(out + "/part-*.jsonl")
            for l in open(f)
            if l.strip()
        ]

    src = (
        spark.read.format("gofish_certstream")
        .option("n_rows", 8).option("n_partitions", 2).load()
    )
    src.write.format("gofish_audit").option("path", out).mode(
        "append"
    ).save()
    assert len(read_all()) == 8
    # second append — the ADVICE defect had this DELETE the first 8
    src.write.format("gofish_audit").option("path", out).mode(
        "append"
    ).save()
    assert len(read_all()) == 16, "append replaced instead of stacking"
    assert len(glob.glob(out + "/_manifest-*.json")) == 2

    # overwrite clears the previously published files and manifests
    src.limit(3).write.format("gofish_audit").option("path", out).mode(
        "overwrite"
    ).save()
    assert len(read_all()) == 3
    assert len(glob.glob(out + "/_manifest-*.json")) == 1


def test_bmp_nonpositive_dimensions_unsupported():
    """Malformed BMP widths/heights surface as ('unknown', None, None)
    — the documented 'unsupported' status — instead of negative
    n_pixels poisoning downstream size filters."""
    from go_fish_spark.operators.multimodal import _parse_image_header

    def bmp(w, h):
        return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 20

    assert _parse_image_header(bmp(-1024, 768)) == ("unknown", None, None)
    assert _parse_image_header(bmp(0, 768)) == ("unknown", None, None)
    assert _parse_image_header(bmp(1024, 0)) == ("unknown", None, None)
    # the two legal forms still parse: bottom-up and top-down row order
    assert _parse_image_header(bmp(1024, 768)) == ("bmp", 1024, 768)
    assert _parse_image_header(bmp(1024, -768)) == ("bmp", 1024, 768)


def test_quota_apportion_rejects_k_over_total(spark):
    """k greater than the corpus size raises instead of silently
    emitting quotas no per-stratum selection can fill."""
    from go_fish_spark.operators.sampling import quota_apportion

    df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2, "g string")
    with pytest.raises(ValueError, match="exceeds total rows"):
        quota_apportion(df, ["g"], k=6).collect()
    # boundary k == total is legal: every row gets a slot
    out = {
        r.g: r.quota for r in quota_apportion(df, ["g"], k=5).collect()
    }
    assert out == {"a": 3, "b": 2}
