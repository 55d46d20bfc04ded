"""Round-13 regressions: the four r12 ADVICE findings (BPE mirror
degenerate-corpus parity, lease-dir normalization, prune key guard,
lease renewal/fencing) plus the round's sig-store compaction and
recall-monitor work."""

from __future__ import annotations

import os

import pytest

# Round-close suite (kernel/lease lifecycles); excluded from the bounded default
# run the driver's pytest window can hold (r14 verdict Next #3b) -
# scripts/close_round.py forces it back on with `-o addopts=`.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F


# --- ADVICE r12 #2: BPE DuckDB mirror on a vocabulary-exhausting corpus -------


def test_bpe_mirror_parity_when_vocab_exhausts(spark, duck):
    """A corpus whose pair population exhausts before n_merges used to
    EMPTY the DuckDB mirror (empty b_i cross-joined away every later
    v_j) while the Spark loop breaks and keeps the last folded vocab.
    The LEFT JOIN ON TRUE passthrough must make both mirrors agree."""
    from go_fish_spark.operators.ngrams import (
        bpe_tokenize,
        bpe_train,
        duck_bpe_tokenize_sql,
        duck_bpe_train_sql,
    )

    # 'ab ab cd' exhausts after 2 merges (a+b, c+d) — ask for 6
    df = spark.createDataFrame([("ab ab cd",), ("ab cd",)], "text string")
    duck.execute(
        "CREATE OR REPLACE VIEW _bpe13 AS "
        "SELECT * FROM (VALUES ('ab ab cd'), ('ab cd')) t(text)"
    )

    got_train = [
        tuple(r)
        for r in bpe_train(df, "text", n_merges=6)
        .orderBy("merge_idx")
        .collect()
    ]
    want_train = duck.execute(duck_bpe_train_sql("_bpe13", "text", 6)).fetchall()
    assert got_train == [tuple(r) for r in want_train]
    assert len(got_train) == 2  # exhausted after two merges, both sides

    got_tok = [
        tuple(r)
        for r in bpe_tokenize(df, "text", n_merges=6, top_k=10).collect()
    ]
    want_tok = duck.execute(
        duck_bpe_tokenize_sql("_bpe13", "text", 6, 10)
    ).fetchall()
    assert got_tok == [tuple(r) for r in want_tok]
    assert len(got_tok) == 2  # real rows, not the old empty mirror


# --- ADVICE r12 #3: relative store paths must not crash the lease -------------


def test_compact_label_store_relative_path(spark, tmp_path, monkeypatch):
    import shutil

    from go_fish_spark.streaming.labelstore import (
        append_label_patch,
        compact_label_store,
        read_label_store,
    )

    # NOTE: Spark resolves relative parquet paths against the JVM cwd,
    # not Python's — the store data lands under the JVM cwd while the
    # Python-side lease/manifest paths resolve against Python's cwd.
    # The bug under test is Python-side (dirname('') crashing makedirs),
    # so chdir covers it; sweep both roots afterwards.
    monkeypatch.chdir(tmp_path)
    jvm_cwd = spark.sparkContext._jvm.System.getProperty("user.dir")
    try:
        patch = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 3)], "id long, component long"
        )
        append_label_patch(patch, "labels", batch_id=0, n_shards=4)
        # bare relative path: dirname('labels') == '' crashed makedirs
        n = compact_label_store(spark, "labels", n_shards=4)
        assert n == 3
        got = {
            (r["id"], r["component"])
            for r in read_label_store(spark, "labels").collect()
        }
        assert got == {(1, 1), (2, 1), (3, 3)}
    finally:
        for root in {str(tmp_path), jvm_cwd}:
            for leaf in ("labels", "labels_gen", "labels_MANIFEST.json"):
                p = os.path.join(root, leaf)
                shutil.rmtree(p, ignore_errors=True)
                if os.path.isfile(p):
                    os.remove(p)


# --- ADVICE r12 #4: prune_covered_files refuses non-partition keys ------------


def test_prune_covered_files_guards_nonconstant_key(spark, tmp_path):
    from go_fish_spark.streaming import storekernel as sk

    path = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, 10, 0), (2, 20, 0)], "id long, shard long, _batch_id long"
    ).coalesce(1).write.parquet(path)  # shard NOT a partition column
    with pytest.raises(ValueError, match="not .*constant within file"):
        sk.prune_covered_files(
            spark, path, 5, key_col="shard", covered_by_key={"10": 5}
        )
    # a real partition column still prunes
    path2 = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, 0, 0), (2, 1, 0)], "id long, shard long, _batch_id long"
    ).write.partitionBy("shard").parquet(path2)
    removed = sk.prune_covered_files(
        spark, path2, -1, key_col="shard", covered_by_key={"0": 5}
    )
    assert removed >= 1


# --- r12 verdict Next #5: recall monitor without a per-batch corpus scan ------


def test_ann_search_stream_full_probe_adc_monitor(spark, tmp_path):
    """The full-probe-ADC pseudo-truth mode must ground-truth from the
    STORE alone (no raw-vector lake hand-in) and report recall ≈ the
    n_probe routing loss: probing every cell against itself scores 1.0;
    a starved n_probe scores below the exact-mode estimate never above
    it + quantization noise."""
    from test_round12 import _ann_corpus

    from go_fish_spark.streaming import annstore

    df = _ann_corpus(spark, 120)
    store = str(tmp_path / "ann")
    src = str(tmp_path / "in")
    df.write.parquet(src)
    annstore.ann_store_stream(
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(src),
        store, str(tmp_path / "cp1"), n_cells=8, m=4, ksub=16,
    ).awaitTermination(120)

    qsrc = str(tmp_path / "q")
    df.filter(F.col("vec_id") < 12).select(
        "vec_id", "embedding"
    ).write.parquet(qsrc)

    infos = []
    annstore.ann_search_stream(
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(qsrc),
        store, str(tmp_path / "out"), str(tmp_path / "cp2"),
        k=5, n_probe=8,  # every cell probed -> routing loss is zero
        recall_mode="full_probe_adc", recall_sample=6,
        on_batch=infos.append,
    ).awaitTermination(120)
    assert infos and infos[0]["recall_mode"] == "full_probe_adc"
    assert infos[0]["recall_at_k"] == 1.0  # full probe vs full probe

    infos2 = []
    annstore.ann_search_stream(
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(qsrc),
        store, str(tmp_path / "out2"), str(tmp_path / "cp3"),
        # k larger than one cell's population with starved routing —
        # the top-k MUST span cells, so n_probe=1 provably loses
        k=40, n_probe=1,
        recall_mode="full_probe_adc", recall_sample=6,
        on_batch=infos2.append,
    ).awaitTermination(120)
    assert 0.0 <= infos2[0]["recall_at_k"] < 1.0

    with pytest.raises(ValueError, match="recall_mode"):
        annstore.ann_search_stream(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .parquet(qsrc),
            store, str(tmp_path / "out3"), str(tmp_path / "cp4"),
            recall_mode="typo",
        )


# --- r12 verdict Next #3: bloom phase 2 must not force the eval broadcast -----


def test_bloom_decontam_phase2_unhinted(spark):
    """`bloom_contaminated_docs`'s verification join must NOT force a
    broadcast of the full eval shingle vocabulary (that forced
    broadcast was the exact structure the function exists to avoid —
    AQE picks at runtime instead). The only broadcast hint in the plan
    is phase 1's one-row bit-array frame; results stay identical to
    the exact form."""
    from go_fish_spark.operators.decontam import (
        bloom_contaminated_docs,
        contaminated_docs,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "clean words only here"),
         (3, "beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "beta gamma delta"),], "eid long, text string"
    )
    res = bloom_contaminated_docs(train, ev, "doc_id", "text", k=3)
    plan = res._jdf.queryExecution().analyzed().toString()
    assert plan.count("ResolvedHint") == 1  # the bit-array frame only
    got = {tuple(r) for r in res.collect()}
    want = {
        tuple(r)
        for r in contaminated_docs(train, ev, "doc_id", "text", k=3).collect()
    }
    assert got == want and got  # identical by construction, non-empty


# --- r12 verdict Next #2 / ADVICE #1: lease fencing + renewal -----------------


def test_fenced_publish_refused_after_ttl_reclaim(tmp_path):
    """A stale-but-alive writer whose lease was TTL-reclaimed must be
    REFUSED at the commit point (fail-stop), leaving the manifest
    exactly as the new holder sees it."""
    import time

    from go_fish_spark.streaming import storekernel as sk

    d = str(tmp_path)
    a = sk.acquire_lease(d, "writer-a", ttl_s=0.05)
    time.sleep(0.1)
    b = sk.acquire_lease(d, "writer-b", ttl_s=600)  # TTL-stale reclaim
    assert b["nonce"] != a["nonce"]
    man = os.path.join(d, "M.json")
    with pytest.raises(sk.LeaseLost, match="reclaimed by 'writer-b'"):
        sk.atomic_write_json(man, {"gen": 99}, fence=(d, a["nonce"]))
    assert not os.path.exists(man)  # the torn tmp was swept, no publish
    assert not os.path.exists(man + ".tmp")
    # the live holder's fenced publish goes through
    sk.atomic_write_json(man, {"gen": 1}, fence=(d, b["nonce"]))
    assert sk.read_json_if_exists(man) == {"gen": 1}


def test_lease_renewal_survives_past_ttl(tmp_path):
    """A batch longer than ttl_s that heartbeats is never treated as
    crashed: competing writers stay refused across multiple TTLs."""
    import time

    from go_fish_spark.streaming import storekernel as sk

    d = str(tmp_path)
    a = sk.acquire_lease(d, "slow-writer", ttl_s=0.3)
    for _ in range(4):  # 0.6s total — two full TTLs
        time.sleep(0.15)
        renewed = sk.renew_lease(d, a["nonce"])
        assert renewed["nonce"] == a["nonce"]
        with pytest.raises(sk.LeaseHeld):
            sk.acquire_lease(d, "writer-b", ttl_s=600)
    # renewal kept ownership — the fenced publish still succeeds
    sk.atomic_write_json(
        os.path.join(d, "M.json"), {"ok": True}, fence=(d, a["nonce"])
    )
    sk.release_lease(d, "slow-writer", nonce=a["nonce"])
    sk.acquire_lease(d, "writer-b", ttl_s=600)  # now free


def test_late_release_preserves_new_holder(tmp_path):
    """A reclaimed-from writer releasing late (same OWNER string — PID
    reuse / replayed identity) must not delete the new holder's lease:
    the nonce check is exact where the owner check could not be."""
    import time

    from go_fish_spark.streaming import storekernel as sk

    d = str(tmp_path)
    a = sk.acquire_lease(d, "stream:ckpt", ttl_s=0.05)
    time.sleep(0.1)
    b = sk.acquire_lease(d, "stream:ckpt", ttl_s=600)  # same owner string
    sk.release_lease(d, "stream:ckpt", nonce=a["nonce"])  # late release
    assert sk.verify_lease(d, b["nonce"])["nonce"] == b["nonce"]
    with pytest.raises(sk.LeaseLost):
        sk.verify_lease(d, a["nonce"])


def test_compact_refused_at_publish_when_lease_stolen(spark, tmp_path):
    """End-to-end fail-stop: a compaction holding a dead fencing token
    is refused AT THE MANIFEST REPOINT — no manifest lands, and the
    store keeps serving the raw patches unchanged."""
    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.labelstore import (
        append_label_patch,
        compact_label_store,
        read_compaction_manifest,
        read_label_store,
    )

    store_dir = str(tmp_path / "store")
    labels = os.path.join(store_dir, "labels")
    patch = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "id long, component long"
    )
    append_label_patch(patch, labels, batch_id=0, n_shards=4)
    holder = sk.acquire_lease(store_dir, "the-new-holder", ttl_s=600)
    with pytest.raises(sk.LeaseLost):
        compact_label_store(
            spark, labels, n_shards=4, lease=False,
            fence=(store_dir, "reclaimed-dead-nonce"),
        )
    assert read_compaction_manifest(labels) is None  # repoint refused
    got = {
        (r["id"], r["component"])
        for r in read_label_store(spark, labels).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 3)}  # patches intact
    sk.release_lease(store_dir, "the-new-holder", nonce=holder["nonce"])


# --- r12 verdict Next #4: the single-writer argument, cross-PROCESS -----------

_XPROC_COMPACTOR = r"""
import os, sys, time
from pyspark.sql import SparkSession

labels = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", os.path.dirname(labels) + "/wh")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from go_fish_spark.streaming import storekernel as sk
from go_fish_spark.streaming.labelstore import compact_label_store

try:
    compact_label_store(spark, labels, n_shards=4)
    print("UNEXPECTED-FOLD", flush=True)
    sys.exit(2)
except sk.LeaseHeld:
    print("REFUSED", flush=True)

deadline = time.time() + 90
while time.time() < deadline:  # parent releases the lease after REFUSED
    try:
        n = compact_label_store(spark, labels, n_shards=4)
        print(f"FOLDED {n}", flush=True)
        sys.exit(0)
    except sk.LeaseHeld:
        time.sleep(0.5)
sys.exit(3)
"""


def test_cross_process_compactor_refused_then_folds(spark, tmp_path):
    """The single-writer argument as it actually runs in production: a
    SECOND OS PROCESS (own JVM, own SparkSession) attempting
    compact_label_store while the maintenance stream's lease is held
    must be REFUSED; after the lease frees it folds, and the reader of
    record returns exactly what it returned before the out-of-process
    fold. (The r12 lease tests were all in-process — this is the test
    the guarantee rests on.)"""
    import subprocess
    import sys

    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.labelstore import (
        label_store_maintenance_stream,
        read_compaction_manifest,
        read_label_store,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    labels = os.path.join(store, "labels")
    schema = "doc_id long, text string"
    rows = [(i, f"the quick document number {i % 7} body") for i in range(40)]
    os.makedirs(src)
    for b in range(2):
        spark.createDataFrame(
            [r for r in rows if r[0] % 2 == b], schema
        ).write.mode("append").parquet(src)
        label_store_maintenance_stream(
            spark.readStream.schema(schema).parquet(src),
            store, str(tmp_path / "cp"), bands=32, threshold=0.3,
            portable=True, n_shards=4,
        ).awaitTermination(120)
    before = sorted(map(tuple, read_label_store(spark, labels).collect()))
    assert before

    # hold the lease exactly as the stream does mid-batch
    held = sk.acquire_lease(store, "stream:live-batch-sim", ttl_s=600)
    child = subprocess.Popen(
        [sys.executable, "-c", _XPROC_COMPACTOR, labels],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo",
    )
    try:
        line = child.stdout.readline().strip()
        assert line == "REFUSED", f"child said {line!r}"
        assert read_compaction_manifest(labels) is None  # nothing folded
        sk.release_lease(store, "stream:live-batch-sim", nonce=held["nonce"])
        out, _ = child.communicate(timeout=180)
        assert child.returncode == 0, f"child exit {child.returncode}: {out}"
        assert out.strip().startswith("FOLDED")
    finally:
        if child.poll() is None:
            child.kill()
    man = read_compaction_manifest(labels)
    assert man is not None and man["gen"] == 1
    after = sorted(map(tuple, read_label_store(spark, labels).collect()))
    assert after == before  # read-back parity through the foreign fold


# --- round-13 review pass 2: lease/fold hardening ------------------------------


def test_reclaim_restores_fresh_foreign_lease(tmp_path, monkeypatch):
    """The stale-reclaim race, closed: a writer that judged the lease
    stale from a STALE READ (it changed hands before its rename) must
    restore the fresh holder's lease and raise LeaseHeld — never leave
    two live holders."""
    from go_fish_spark.streaming import storekernel as sk

    d = str(tmp_path)
    b = sk.acquire_lease(d, "writer-b", ttl_s=600)  # the fresh holder
    real_read = sk._read_lease_doc
    calls = {"n": 0}

    def stale_first_read(path):
        calls["n"] += 1
        if calls["n"] == 1 and path == sk.lease_path(d):
            # what C saw before B took over: a long-dead lease
            return {"owner": "dead", "acquired_at": 0.0, "ttl_s": 1.0,
                    "nonce": "dead"}
        return real_read(path)

    monkeypatch.setattr(sk, "_read_lease_doc", stale_first_read)
    with pytest.raises(sk.LeaseHeld, match="changed hands"):
        sk.acquire_lease(d, "writer-c", ttl_s=600)
    monkeypatch.setattr(sk, "_read_lease_doc", real_read)
    # B's lease survived the attempted steal intact
    assert sk.verify_lease(d, b["nonce"])["owner"] == "writer-b"


def test_torn_lease_file_maps_to_protocol_errors(tmp_path):
    """A torn/unreadable lease file must surface as LeaseHeld (acquire:
    never reclaim what you cannot judge) and LeaseLost (verify:
    fail-stop) — not as an escaping JSONDecodeError."""
    from go_fish_spark.streaming import storekernel as sk

    d = str(tmp_path)
    with open(sk.lease_path(d), "w") as fh:
        fh.write('{"owner": "half-writ')  # torn mid-publish
    with pytest.raises(sk.LeaseHeld, match="unreadable"):
        sk.acquire_lease(d, "writer-a")
    with pytest.raises(sk.LeaseLost):
        sk.verify_lease(d, "any-nonce")
    sk.release_lease(d, "anyone")  # no-op, no crash
    assert os.path.exists(sk.lease_path(d))  # and nothing deleted


def test_fold_refuses_foreign_commit_point(spark, tmp_path):
    """A COMMIT.json whose commit point is BELOW the store's covered
    fold stamp belongs to a different batch-id space — applying it as a
    cut would silently drop the whole previous generation; the fold
    must refuse instead."""
    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
    )

    store = str(tmp_path / "store" / "sigs")
    append_sig_patch(_sig_rows(spark, 10, "a"), store, 10, n_shards=4)
    compact_signature_store(spark, store, n_shards=4)  # covered = 10
    sk.publish_commit(str(tmp_path / "store"), 5)  # foreign batch space
    with pytest.raises(ValueError, match="does not belong"):
        compact_signature_store(spark, store, n_shards=4)


def test_walk_ignores_temporary_dirs(spark, tmp_path):
    """Uncommitted task files under _temporary/ (a crashed append) are
    invisible to readers and must be invisible to the compaction
    pressure signal too — else one crash inflates the plan forever."""
    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        sig_compaction_plan,
    )

    store = str(tmp_path / "sigs")
    append_sig_patch(_sig_rows(spark, 8, "a"), store, 0, n_shards=4)
    files0, _b, per0 = sk.walk_parquet_files(store)
    staged = os.path.join(store, "_temporary", "0", "shard=9")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-crashed.parquet"), "wb") as fh:
        fh.write(b"not a real footer")
    files1, _b, per1 = sk.walk_parquet_files(store)
    assert (files1, per1) == (files0, per0)
    plan = sig_compaction_plan(store, file_cutoff=1.0, min_patch_files=1)
    assert plan["legacy_files"] == 0  # no phantom legacy pressure


def test_sig_read_identical_before_and_after_fold_on_dup_rows(
    spark, tmp_path
):
    """True duplicate-id rows inside ONE batch (written via the raw
    append, bypassing the stream's per-batch dedup) must read back
    identically before and after a fold — reader and fold share one
    total order."""
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
        read_signature_store,
    )

    store = str(tmp_path / "store" / "sigs")
    dup = spark.createDataFrame(
        [(1, [9, 9]), (1, [1, 1]), (2, [5, 5])],
        "doc_id long, _sig array<bigint>",
    )
    append_sig_patch(dup, store, 0, n_shards=4)
    before = {
        (r["doc_id"], tuple(r["_sig"]))
        for r in read_signature_store(spark, store).collect()
    }
    assert before == {(1, (1, 1)), (2, (5, 5))}  # min by value order
    compact_signature_store(spark, store, n_shards=4)
    after = {
        (r["doc_id"], tuple(r["_sig"]))
        for r in read_signature_store(spark, store).collect()
    }
    assert after == before


# --- r12 verdict Next #1: sig-store compaction on the kernel ------------------


def _live_parquet_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
    return out


def _sig_rows(spark, n, tag=""):
    return spark.createDataFrame(
        [(i, [i, i + 1, hash(tag) % 97]) for i in range(n)],
        "doc_id long, _sig array<bigint>",
    )


def test_sig_store_fold_midsequence_readback(spark, tmp_path):
    """The x163 pattern for sigs: append → FULL fold → more appends +
    edits → SELECTIVE fold with hard-link carry — the reader of record
    (generation + per-shard-cut patches + latest-wins) must always
    equal the current corpus' signatures."""
    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
        read_signature_store,
    )

    store = str(tmp_path / "store" / "sigs")
    append_sig_patch(_sig_rows(spark, 30, "a"), store, 0, n_shards=8)
    n = compact_signature_store(spark, store, n_shards=8)
    assert n == 30
    man = sk.read_store_manifest(store)
    assert man["gen"] == 1 and man["n_shards"] == 8
    # batch 1: 20 new ids; batch 2: re-append (edit) ids 0-9
    spark.createDataFrame(
        [(30 + i, [7, 7, 7]) for i in range(20)],
        "doc_id long, _sig array<bigint>",
    ).createOrReplaceTempView("_b1")
    append_sig_patch(spark.table("_b1"), store, 1, n_shards=8)
    append_sig_patch(_sig_rows(spark, 10, "EDIT"), store, 2, n_shards=8)
    # selective fold: only shards 0-3; 4-7 hard-link-carried
    gen1 = sk.store_generation_path(store, 1)
    pre_inodes = {
        f: os.stat(f).st_ino
        for f in _live_parquet_files(gen1)
        if any(f"shard={s}/" in f for s in range(4, 8))
    }
    compact_signature_store(spark, store, n_shards=8, shards=[0, 1, 2, 3])
    man2 = sk.read_store_manifest(store)
    assert man2["gen"] == 2
    assert set(man2["covered"]) == {"0", "1", "2", "3"}
    gen2 = sk.store_generation_path(store, 2)
    carried = {
        os.path.basename(f): os.stat(f).st_ino
        for f in _live_parquet_files(gen2)
        if any(f"shard={s}/" in f for s in range(4, 8))
    }
    assert carried  # cold shards rode along...
    pre_by_name = {os.path.basename(f): i for f, i in pre_inodes.items()}
    assert all(
        carried[b] == pre_by_name[b] for b in carried
    )  # ...by hard link: same inode, zero bytes rewritten
    got = {
        (r["doc_id"], tuple(r["_sig"]))
        for r in read_signature_store(spark, store).collect()
    }
    want = {(i, (i, i + 1, hash("EDIT") % 97)) for i in range(10)}
    want |= {(i, (i, i + 1, hash("a") % 97)) for i in range(10, 30)}
    want |= {(30 + i, (7, 7, 7)) for i in range(20)}
    assert got == want


def test_sig_store_legacy_files_fold_away(spark, tmp_path):
    """Pre-discipline files (no shard, no _batch_id) read as batch -1
    (they lose to any stamped re-append) and a FULL fold absorbs them
    into the generation and prunes the legacy files themselves."""
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
        read_signature_store,
    )

    store = str(tmp_path / "store" / "sigs")
    # legacy flat write: no shard, no batch stamp
    _sig_rows(spark, 20, "legacy").coalesce(1).write.mode("append").parquet(
        store
    )
    # stamped sharded re-append of ids 0-4 must supersede
    append_sig_patch(_sig_rows(spark, 5, "new"), store, 0, n_shards=4)
    want = {(i, (i, i + 1, hash("new") % 97)) for i in range(5)}
    want |= {(i, (i, i + 1, hash("legacy") % 97)) for i in range(5, 20)}

    def got():
        return {
            (r["doc_id"], tuple(r["_sig"]))
            for r in read_signature_store(spark, store).collect()
        }

    assert got() == want  # before any fold
    files_before = len(_live_parquet_files(store))
    n = compact_signature_store(spark, store, n_shards=4)
    assert n == 20
    assert got() == want  # after the full fold
    # the legacy (unstamped) files were provably absorbed — pruned
    assert len(_live_parquet_files(store)) < files_before


def test_sig_store_pure_flat_legacy_full_fold(spark, tmp_path):
    """A PURE pre-discipline store (flat files only, no shard dirs, no
    stamps) must survive a full fold end to end: the fold absorbs the
    rows, the prune removes the provably-absorbed flat files without
    crashing on the missing shard column, and the read-back is
    unchanged."""
    from go_fish_spark.streaming.sigstore import (
        compact_signature_store,
        read_signature_store,
    )

    store = str(tmp_path / "store" / "sigs")
    for i in range(3):  # three flat legacy appends
        _sig_rows(spark, 10, f"b{i}").filter(
            F.col("doc_id") % 3 == i
        ).coalesce(1).write.mode("append").parquet(store)
    want = {
        (r["doc_id"], tuple(r["_sig"]))
        for r in read_signature_store(spark, store).collect()
    }
    files_before = len(_live_parquet_files(store))
    assert files_before == 3
    n = compact_signature_store(spark, store, n_shards=4)
    assert n == 10
    got = {
        (r["doc_id"], tuple(r["_sig"]))
        for r in read_signature_store(spark, store).collect()
    }
    assert got == want
    assert len(_live_parquet_files(store)) == 0  # flat files absorbed


def test_plan_forces_full_scope_while_legacy_files_exist(spark, tmp_path):
    """Legacy root files belong to no single shard — only a FULL fold
    absorbs them, so the plan must force fold_scope='full' (and report
    them) while any exist; once absorbed, selective folds resume."""
    from go_fish_spark.streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
        sig_compaction_plan,
    )

    store = str(tmp_path / "store" / "sigs")
    _sig_rows(spark, 10, "legacy").coalesce(1).write.mode("append").parquet(
        store
    )
    for b in range(3):  # fragment one shard population
        append_sig_patch(_sig_rows(spark, 20, f"b{b}"), store, b, n_shards=4)
    plan = sig_compaction_plan(store, file_cutoff=2.0, min_patch_files=1)
    assert plan["legacy_files"] == 1
    assert plan["fold_scope"] == "full"  # never 'selective' w/ legacy
    compact_signature_store(spark, store, n_shards=4)  # absorbs legacy
    for b in range(3, 6):
        append_sig_patch(
            _sig_rows(spark, 4, f"b{b}"), store, b, n_shards=4
        )
    plan2 = sig_compaction_plan(store, file_cutoff=2.0, min_patch_files=1)
    assert plan2["legacy_files"] == 0
    # with legacy gone, per-shard selectivity is allowed again
    assert plan2["fold_scope"] in ("selective", "full")


def test_sig_stream_compaction_policy(spark, tmp_path):
    """E2E: the sig maintenance stream prices the kernel plan after
    each batch and folds inline under its own lease; read-back parity
    through the folds."""
    from go_fish_spark.streaming import storekernel as sk
    from go_fish_spark.streaming.sigstore import (
        read_signature_store,
        signature_store_stream,
    )

    src = str(tmp_path / "in")
    store = str(tmp_path / "store" / "sigs")
    cp = str(tmp_path / "cp")
    os.makedirs(src)
    schema = "doc_id long, text string"
    decisions = []

    def drain():
        signature_store_stream(
            spark.readStream.schema(schema).parquet(src),
            store, cp, n_shards=4, portable=True,
            compaction_policy=True, compaction_file_cutoff=1.0,
            compaction_min_files=1, on_compaction=decisions.append,
        ).awaitTermination(120)

    rows = [(i, f"doc number {i} text body") for i in range(30)]
    for b in range(3):
        spark.createDataFrame(
            [r for r in rows if r[0] % 3 == b], schema
        ).write.mode("append").parquet(src)
        drain()
    assert any(d["action"] == "compact" for d in decisions)
    assert sk.read_store_manifest(store) is not None
    from go_fish_spark.operators.dedup import minhash_signature

    want = {
        tuple(r)
        for r in spark.createDataFrame(rows, schema)
        .select(
            "doc_id",
            F.md5(F.concat_ws(",", minhash_signature(
                "text", 64, 3, 42, portable=True
            ).cast("array<string>"))).alias("m"),
        )
        .collect()
    }
    got = {
        tuple(r)
        for r in read_signature_store(spark, store)
        .select(
            "doc_id",
            F.md5(F.concat_ws(",", F.col("_sig").cast("array<string>"))).alias(
                "m"
            ),
        )
        .collect()
    }
    assert got == want
