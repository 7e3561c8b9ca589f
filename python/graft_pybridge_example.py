"""PySpark reachability example + smoke test for graft.api.PyBridge.

Run via scripts/pybridge_smoke.sh (which packages the library jar and
invokes spark-submit), or directly:

    spark-submit --jars target/scala-2.13/oeemetlspark_2.13-0.1.0.jar \
        python/graft_pybridge_example.py /root/testdata/sf0.001

Every PyBridge entry point is called through py4j and semantically
asserted, so a signature drift on the Scala side fails this script,
not a user's notebook. Exit code 0 = the whole call path works.
"""
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

bridge = spark._jvm.graft.api.PyBridge
jspark = spark._jsparkSession


def wrap(jdf):
    """Lift a py4j DataFrame handle back into a PySpark DataFrame."""
    return DataFrame(jdf, spark)


failures = []


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"[pybridge] {status:4s} {name} {detail}")
    if not cond:
        failures.append(name)


orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
n_orders = orders.count()

# --- hashSplit: deterministic train/val/test labels -----------------
split = wrap(
    bridge.hashSplit(
        orders._jdf, "o_orderkey", "demo-salt",
        ["train", "val", "test"], [0.8, 0.1, 0.1], "split",
    )
)
counts = {r["split"]: r["n"] for r in
          split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
check("hashSplit covers every row", sum(counts.values()) == n_orders, str(counts))
check("hashSplit ~80/10/10", abs(counts.get("train", 0) / n_orders - 0.8) < 0.05, str(counts))
split2 = wrap(
    bridge.hashSplit(
        orders._jdf, "o_orderkey", "demo-salt",
        ["train", "val", "test"], [0.8, 0.1, 0.1], "split",
    )
)
check("hashSplit deterministic", split.exceptAll(split2).count() == 0)

# --- hashSample: reproducible subset ---------------------------------
sample = wrap(bridge.hashSample(orders._jdf, "o_orderkey", "demo-salt", 0.25))
n_sample = sample.count()
check("hashSample ~25%", abs(n_sample / n_orders - 0.25) < 0.05, f"{n_sample}/{n_orders}")
sample2 = wrap(bridge.hashSample(orders._jdf, "o_orderkey", "demo-salt", 0.25))
check("hashSample deterministic", sample.exceptAll(sample2).count() == 0)

# --- profile: one row per schema column ------------------------------
prof = wrap(bridge.profile(orders._jdf))
check("profile rows == profiled columns", prof.count() == len(orders.columns),
      f"{prof.count()} rows")
nrow = {r["col_name"]: r["n_rows"] for r in prof.collect()}
check("profile n_rows exact", all(v == n_orders for v in nrow.values()))

# --- ntileBySketch: balanced exact quartiles --------------------------
q = wrap(bridge.ntileBySketch(orders._jdf, "o_totalprice", "o_orderkey", 4))
sizes = sorted(r["n"] for r in
               q.groupBy("ntile").count().withColumnRenamed("count", "n").collect())
check("ntileBySketch 4 buckets", len(sizes) == 4, str(sizes))
check("ntileBySketch exact balance", sizes[-1] - sizes[0] <= 1, str(sizes))

# --- saltedJoin: equals the plain inner join --------------------------
customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
salted = wrap(
    bridge.saltedJoin(orders._jdf, customer._jdf, "o_custkey", "c_custkey", 8)
)
plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
check("saltedJoin row-equal to plain join", salted.count() == plain.count(),
      f"{salted.count()} vs {plain.count()}")

# --- SnapshotTable: create / merge / time travel ----------------------
base = tempfile.mkdtemp(prefix="graft_pybridge_snap_")
table0 = orders.select("o_orderkey", "o_totalprice").limit(100)
bridge.snapshotCreate(jspark, base, table0._jdf, "o_orderkey", 4)
check("snapshot v0 committed", bridge.snapshotLatestVersion(jspark, base) == 0)
changes = spark.createDataFrame(
    [(999999001, "U", 42.0), (999999002, "U", 43.0)],
    ["o_orderkey", "op", "o_totalprice"],
)
v1 = bridge.snapshotMerge(jspark, base, changes._jdf, "o_orderkey", 4)
check("snapshot merge returns v1", v1 == 1)
latest = wrap(bridge.snapshotRead(jspark, base))
v0 = wrap(bridge.snapshotAsOf(jspark, base, 0))
check("snapshot latest = v0 + 2 inserts", latest.count() == v0.count() + 2,
      f"{latest.count()} vs {v0.count()}")
check("snapshot time travel isolates v0",
      v0.where("o_orderkey >= 999999000").count() == 0)

# --- OPTIMIZE ... CLUSTER BY: layout maintenance ----------------------
v_opt = bridge.snapshotOptimizeCluster(jspark, base, "o_orderkey",
                                       "o_totalprice", 4, 4)
check("snapshot optimizeCluster commits a new version", v_opt == 2)
opt = wrap(bridge.snapshotAsOf(jspark, base, v_opt))
check("optimizeCluster preserves content",
      opt.count() == latest.count()
      and opt.exceptAll(latest).count() == 0)

# --- manifest-stats pruned range read (round 17) ----------------------
pruned = wrap(bridge.snapshotReadRange(jspark, base, v_opt, "o_totalprice",
                                       "0.00", "99999999.99"))
check("snapshotReadRange full band sees every row",
      pruned.count() == opt.count(), f"{pruned.count()} vs {opt.count()}")
mid = wrap(bridge.snapshotReadRange(jspark, base, v_opt, "o_totalprice",
                                    "50000.00", "150000.00"))
direct = opt.where("o_totalprice BETWEEN 50000.00 AND 150000.00")
check("snapshotReadRange band equals direct filter",
      mid.count() == direct.count(), f"{mid.count()} vs {direct.count()}")

# --- compact / diff / vacuum (round 17) -------------------------------
v_cmp = bridge.snapshotCompact(jspark, base, "o_orderkey", 2)
check("snapshotCompact commits a new version", v_cmp == v_opt + 1)
cmp_df = wrap(bridge.snapshotAsOf(jspark, base, v_cmp))
check("snapshotCompact preserves content",
      cmp_df.count() == opt.count() and cmp_df.exceptAll(opt).count() == 0)
delta = wrap(bridge.snapshotDiff(jspark, base, 0, 1, "o_orderkey"))
check("snapshotDiff sees the two v1 inserts",
      delta.count() == 2 and
      delta.where("change = 'added'").count() == 2,
      f"{delta.count()} changes")
dropped = bridge.snapshotVacuum(jspark, base, 2, 0)
check("snapshotVacuum drops old versions, keeps 2",
      dropped[0] >= 1 and bridge.snapshotLatestVersion(jspark, base) == v_cmp,
      f"dropped versions={dropped[0]} files={dropped[1]}")
check("snapshot newest still readable after vacuum",
      wrap(bridge.snapshotRead(jspark, base)).count() == cmp_df.count())

# --- round-17 continuation: rename / restore / delete-where -----------
v_ren = bridge.snapshotRenameColumn(jspark, base, "o_totalprice", "o_amount")
renamed = wrap(bridge.snapshotRead(jspark, base))
check("snapshotRenameColumn is a logical rename",
      "o_amount" in renamed.columns and "o_totalprice" not in renamed.columns,
      str(renamed.columns))
check("snapshot time travel keeps the old name",
      "o_totalprice" in wrap(bridge.snapshotAsOf(jspark, base, v_cmp)).columns)
v_res = bridge.snapshotRestore(jspark, base, v_cmp)
check("snapshotRestore returns latest+1", v_res == v_ren + 1)
check("snapshotRestore brings the pre-rename schema back",
      "o_totalprice" in wrap(bridge.snapshotRead(jspark, base)).columns)
v_opt2 = bridge.snapshotOptimizeCluster(jspark, base, "o_orderkey",
                                        "o_totalprice", 4, 2)
before_rows = wrap(bridge.snapshotRead(jspark, base)).count()
in_band = wrap(bridge.snapshotRead(jspark, base)) \
    .where("o_totalprice between 1.00 and 80000.00").count()
dl = bridge.snapshotDeleteRange(jspark, base, "o_orderkey", "o_totalprice",
                                "1.00", "80000.00", 4)
check("snapshotDeleteRange publishes and skips disjoint files",
      dl[0] == v_opt2 + 1 and dl[2] > 0, str(list(dl)))
check("snapshotDeleteRange removes exactly the band",
      wrap(bridge.snapshotRead(jspark, base)).count() == before_rows - in_band)
v_head = bridge.snapshotLatestVersion(jspark, base)
follower = wrap(bridge.snapshotApplyDiff(
    bridge.snapshotAsOf(jspark, base, v_head - 1),
    bridge.snapshotDiff(jspark, base, v_head - 1, v_head, "o_orderkey"),
    "o_orderkey"))
head_df = wrap(bridge.snapshotAsOf(jspark, base, v_head))
check("snapshotApplyDiff folds the delta to the head",
      follower.exceptAll(head_df).count() == 0 and
      head_df.exceptAll(follower).count() == 0)
probe = head_df.select("o_orderkey").limit(3)
bks = bridge.snapshotBucketsOf(jspark, base, v_head, probe._jdf,
                               "o_orderkey", 4)
looked = wrap(bridge.snapshotReadBuckets(jspark, base, v_head, bks))
probe_keys = [r["o_orderkey"] for r in probe.collect()]
check("snapshotReadBuckets serves the probed keys",
      looked.where(looked.o_orderkey.isin(probe_keys)).count() == len(probe_keys),
      str(list(bks)))
branch = base + "_branch"
bv = bridge.snapshotCloneShallow(jspark, base, branch, v_head)
head_n = head_df.count()
check("snapshotCloneShallow is a zero-copy v0",
      bv == 0 and wrap(bridge.snapshotAsOf(jspark, branch, 0)).count() == head_n)
check("branch writes never advance the source",
      bridge.snapshotLatestVersion(jspark, base) == v_head)

# --- round 18: recorded addressing / rebucket / merge-back ------------
rec = bridge.snapshotRecordedBuckets(jspark, base, v_head)
check("snapshotRecordedBuckets reads the manifest addressing",
      rec is not None and int(rec[0]) == 4 and rec[1] == "o_orderkey",
      str(None if rec is None else list(rec)))
v_rb = bridge.snapshotRebucket(jspark, base, "o_orderkey", 8)
check("snapshotRebucket re-records the addressing",
      int(bridge.snapshotRecordedBuckets(jspark, base, v_rb)[0]) == 8)
check("snapshotRebucket preserves content",
      wrap(bridge.snapshotRead(jspark, base)).count() ==
      wrap(bridge.snapshotAsOf(jspark, base, v_head)).count())
# merge-back needs the parent still at the branch point: fresh branch
branch2 = base + "_branch2"
bridge.snapshotCloneShallow(jspark, base, branch2, -1)
v_mb = bridge.snapshotMergeBack(jspark, branch2)
check("snapshotMergeBack fast-forwards the parent",
      v_mb == v_rb + 1 and
      wrap(bridge.snapshotRead(jspark, base)).count() ==
      wrap(bridge.snapshotAsOf(jspark, branch2, 0)).count())

# --- round 18: CHECK constraints --------------------------------------
v_ck = bridge.snapshotAddCheckConstraint(jspark, base, "amt_nonneg",
                                         "o_totalprice >= 0")
cks = bridge.snapshotCheckConstraints(jspark, base, v_ck)
check("snapshotCheckConstraints lists the recorded rule",
      len(cks) == 1 and list(cks[0]) == ["amt_nonneg", "o_totalprice >= 0"],
      str([list(c) for c in cks]))
check("pre-constraint versions carry no rules",
      len(bridge.snapshotCheckConstraints(jspark, base, v_ck - 1)) == 0)
v_dk = bridge.snapshotDropCheckConstraint(jspark, base, "amt_nonneg")
check("snapshotDropCheckConstraint removes it",
      len(bridge.snapshotCheckConstraints(jspark, base, v_dk)) == 0)

# --- round 18: change data feed (batch read; streaming = readStream) --
v_cdf = bridge.snapshotEnableChangeFeed(jspark, base)
cdf_changes = spark.createDataFrame(
    [(999999003, "U", 77.0)], ["o_orderkey", "op", "o_totalprice"])
v_fed = bridge.snapshotMerge(jspark, base, cdf_changes._jdf, "o_orderkey", 8)
feed = wrap(bridge.snapshotChangeFeed(jspark, base, v_cdf, v_fed))
check("snapshotChangeFeed returns the fed merge's delta",
      feed.count() == 1 and
      feed.head()["op"] == "U" and
      feed.head()["_commit_version"] == v_fed and
      feed.head()["o_orderkey"] == 999999003,
      str(feed.collect()))
stream_rows = (
    spark.readStream.format("snapshot-cdc")
    .option("path", base).option("startingVersion", str(v_fed)).load()
)
check("snapshot-cdc readStream binds with the cdc schema",
      stream_rows.isStreaming and
      set(["op", "_commit_version"]).issubset(set(stream_rows.columns)),
      str(stream_rows.columns))

# --- profileApprox: one-pass HLL profile ------------------------------
pa = wrap(bridge.profileApprox(orders._jdf))
check("profileApprox rows == profiled columns",
      pa.count() == len(orders.columns), f"{pa.count()} rows")
key_est = {r["col_name"]: r["approx"] for r in pa.collect()}
check("profileApprox key ndv within 5%",
      abs(key_est.get("o_orderkey", 0) / n_orders - 1.0) < 0.05,
      str(key_est.get("o_orderkey")))

# --- CostExplain: node stats / join advisory / ANALYZE ---------------
ns = wrap(bridge.costNodeStats(plain._jdf))
check("costNodeStats positive sizes",
      ns.count() > 0 and ns.where("size_bytes <= 0").count() == 0,
      f"{ns.count()} nodes")
adv = wrap(bridge.costJoinAdvisory(plain._jdf)).collect()
check("costJoinAdvisory sees the join and a broadcastable side",
      len(adv) == 1 and (adv[0]["broadcast_left"] or adv[0]["broadcast_right"]),
      str(adv))
cols = wrap(bridge.costAnalyze(jspark, customer._jdf, "graft_pybridge_cost"))
ndv = {r["column"]: r["distinct_count"] for r in cols.collect()}
check("costAnalyze exact key ndv",
      ndv.get("c_custkey") == customer.count(), str(ndv.get("c_custkey")))
spark.sql("DROP TABLE IF EXISTS graft_pybridge_cost")

print(f"[pybridge] == {('PASS' if not failures else 'FAIL')} "
      f"({len(failures)} failures) ==")
sys.exit(1 if failures else 0)
