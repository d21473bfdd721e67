#!/usr/bin/env python3
"""Seeded differential fuzz over the 17 rel_* queries (r19 verdict #5).

The oracle gate is fixed-fixture; this harness generates randomized
TPC-H-shaped tables per seed — random scales (including EMPTY tables),
per-column null densities (including ALL-NULL columns), hot-key skew,
dangling foreign keys, and tie-heavy value domains — then runs the
existing Verify → DuckDB pipeline on each: `graft.Verify <dir> <out>
<rel-names-csv>` followed by `tools/check.py <dir> <out>`. A seed
passes iff every rel_* row is PASS (rows + schema + hash), i.e. the
Spark plan and the DuckDB oracle agree on data the fixture never shaped.

Deterministic: table contents are a pure function of the seed. Designated
edge seeds force the shapes the r19 verdict called out (empty groups,
all-null columns, ties in O3 top-1 / A4 representative / A5 profile).

Usage: python3 tools/fuzz_rel.py [nSeeds] [outJsonl] [--keep]
       [--family=rel|evt|text|dedup]
       (defaults: 24 seeds, family rel, fuzz_<family>_r20.jsonl; scratch
        dirs under /tmp/fuzz_rel are removed per-seed unless --keep or
        FAIL. --family=evt fuzzes the 12 batch event queries instead:
        a randomized events table — tie-heavy timestamps, null values,
        malformed props, single-user/single-type/empty shapes — beside
        the same seed's rel tables, whose orders feed evt_asof_join.
        --family=text fuzzes the 19 text ops and --family=dedup the 6
        document dedup ops, both over a randomized documents table;
        dedup_minhash_lsh is scored subset+recall>=0.9, approximate by
        design.)
"""
import json
import os
import random
import re
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REL_NAMES = [
    "rel_pricing_summary", "rel_revenue_by_nation",
    "rel_orders_per_customer_histogram", "rel_top_order_per_customer",
    "rel_customers_without_orders", "rel_priorities_by_status",
    "rel_nations_with_presence", "rel_status_by_priority_pivot",
    "rel_customer_order_stats", "rel_parts_ever_ordered",
    "rel_order_reconciliation", "rel_part_enrichment",
    "rel_orders_rollup", "rel_customer_deciles", "rel_customer_unpivot",
    "rel_representative_values", "rel_column_profile",
]
# the batch event family (evt_asof_join also reads orders, which the
# same seed's rel generator provides with an overlapping user domain).
# Event-row contract: event_id/ts/user_id/event_type are non-null (an
# event without identity, time, actor, or kind is not an event); value
# and props are nullable/malformed-able — that is where the engines'
# null handling gets fuzzed.
EVT_NAMES = [
    "evt_sessionize", "evt_hourly_rollup", "evt_running_total",
    "evt_props_profile", "evt_retention", "evt_asof_join",
    "evt_range_join", "evt_funnel", "evt_stickiness", "evt_anomaly",
    "evt_transition_matrix", "evt_value_quantiles",
]
# the text family (19 ops) and the document-based dedup ops (6), both
# over a generated documents table. Document contract: doc_id/text/
# lang/source non-null, text a whitespace-joined token string (what the
# corpus ingest produces); duplicates/near-duplicates/shingle-less
# short docs are the fuzzed shapes. The two embedding dedup ops stay on
# the static fixture (their learned-quantizer oracle mirrors the exact
# training pass; randomizing its input is a different harness).
TEXT_NAMES = [
    "text_token_stats", "text_distinctive_terms", "text_quality",
    "text_lang_id", "text_fingerprint", "text_bpe_tokens",
    "text_stratified_sample", "text_pack_sequences",
    "text_winnow_fingerprint", "text_self_information",
    "text_vocab_coverage", "text_corpus_filter", "text_decontaminate",
    "text_repetition", "text_cross_source_overlap", "text_mixture_plan",
    "text_mixture_apply", "text_corpus_shuffle", "text_chunk_dedup",
]
DEDUP_NAMES = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_clusters", "dedup_clusters_star",
]
FAMILIES = {"rel": REL_NAMES, "evt": EVT_NAMES, "text": TEXT_NAMES,
            "dedup": DEDUP_NAMES}

# tables the generators produce; the rest are symlinked from the static
# fixture dir because check.py registers a DuckDB view for all ten
REL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]
STATIC_DIR = "/root/testdata/sf0.001"
STATIC_TABLES = ["embeddings"]  # events/documents symlink unless generated

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "PROMO", "LARGE", "MEDIUM", "SMALL", "STANDARD",
          "ANODIZED STEEL", "BURNISHED TIN"]  # last two hit the ELSE branch
EPOCH_94 = 757382400          # 1994-01-01 UTC, seconds
EPOCH_00 = 946684800          # 2000-01-01 UTC, seconds


def money(rng, lo=1.0, hi=500000.0):
    return round(rng.uniform(lo, hi), 2)


def ts_us(rng):
    return rng.randrange(EPOCH_94, EPOCH_00) * 1_000_000


def mask(rng, vals, density):
    """Null out ~density of vals (1.0 = all-null column)."""
    if density <= 0:
        return vals
    return [None if rng.random() < density else v for v in vals]


def gen_tables(seed):
    """Build all seven rel tables for one seed. Returns {name: (schema,
    columns-dict)} plus a human note of the forced edge shape."""
    rng = random.Random(seed)
    edge = seed % 8  # designated edge shapes cycle with the seed
    note = {0: "empty orders", 1: "empty lineitem", 2: "empty customer",
            3: "all-null l_quantity", 4: "all-null c_acctbal",
            5: "single-row groups (1 order per key)", 6: "heavy ties",
            7: "plain random"}[edge]

    n_region = rng.randint(1, 6)
    n_nation = rng.randint(1, 30)
    n_cust = 0 if edge == 2 else rng.randint(1, 800)
    n_supp = rng.randint(0, 40)
    n_part = rng.randint(0, 500)
    n_orders = 0 if edge == 0 else (n_cust if edge == 5 and n_cust else rng.randint(1, 4000))
    n_line = 0 if edge == 1 else rng.randint(1, 12000)

    # null densities for nullable (non-key) columns
    def dens():
        return rng.choice([0.0, 0.0, 0.02, 0.1, 0.3])
    tie = edge == 6
    tie_prices = [money(rng) for _ in range(4)]
    tie_quants = [1.0, 2.0, 5.0]

    region = {
        "r_regionkey": list(range(n_region)),
        "r_name": [f"REGION_{i}" for i in range(n_region)],
    }
    nation = {
        "n_nationkey": list(range(n_nation)),
        "n_name": [f"NATION_{i:02d}" for i in range(n_nation)],
        # occasional dangling region ref exercises the inner-join drop
        "n_regionkey": [rng.randrange(n_region + (2 if rng.random() < .1 else 0))
                        for _ in range(n_nation)],
    }
    cust_keys = list(range(1, n_cust + 1))
    customer = {
        "c_custkey": cust_keys,
        "c_name": mask(rng, [f"Customer#{k:09d}" for k in cust_keys], dens()),
        "c_nationkey": mask(rng, [rng.randrange(n_nation + 2) for _ in cust_keys], dens()),
        "c_acctbal": (
            [None] * n_cust if edge == 4 else
            mask(rng, [rng.choice(tie_prices) if tie else money(rng, -999.99, 9999.99)
                       for _ in cust_keys], dens())),
        "c_mktsegment": mask(rng, [rng.choice(SEGMENTS) for _ in cust_keys], dens()),
    }
    supp_keys = list(range(1, n_supp + 1))
    supplier = {
        "s_suppkey": supp_keys,
        "s_name": [f"Supplier#{k:09d}" for k in supp_keys],
        "s_nationkey": mask(rng, [rng.randrange(n_nation + 2) for _ in supp_keys], dens()),
        "s_acctbal": mask(rng, [money(rng, -999.99, 9999.99) for _ in supp_keys], dens()),
    }
    part_keys = list(range(1, n_part + 1))
    part = {
        "p_partkey": part_keys,
        "p_name": mask(rng, [f"part {rng.choice(['ivory','azure','linen','misty','deep'])} "
                             f"{rng.choice(['rose','tan','plum','puff','bisque'])}"
                             for _ in part_keys], dens()),
        # always Brand#<digits>: the oracle CASTs the regex capture to
        # BIGINT and DuckDB hard-errors casting '' (a digitless brand
        # would test the ORACLE's fragility, not the engine)
        "p_brand": mask(rng, [f"Brand#{rng.randint(1, 55)}" for _ in part_keys], dens()),
        "p_type": mask(rng, [rng.choice(PTYPES) for _ in part_keys], dens()),
        "p_size": mask(rng, [rng.randint(1, 50) for _ in part_keys], dens()),
        "p_retailprice": mask(rng, [money(rng, 900, 2100) for _ in part_keys], dens()),
    }
    order_keys = list(range(1, n_orders + 1))
    hot = cust_keys[:max(1, min(10, n_cust))] if n_cust else []

    def pick_cust():
        if rng.random() < 0.05 or not n_cust:      # dangling FK
            return n_cust + rng.randint(1, 100)
        if hot and rng.random() < 0.6:             # hot-key skew
            return rng.choice(hot)
        return rng.randint(1, n_cust)
    if edge == 5 and n_cust:
        o_cust = list(cust_keys)                    # exactly one order each
    else:
        o_cust = [pick_cust() for _ in order_keys]
    orders = {
        "o_orderkey": order_keys,
        "o_custkey": o_cust,
        "o_orderstatus": mask(rng, [rng.choice("FOP") for _ in order_keys], dens()),
        "o_totalprice": mask(rng, [rng.choice(tie_prices) if (tie or rng.random() < .2)
                                   else money(rng) for _ in order_keys], dens()),
        "o_orderdate": mask(rng, [ts_us(rng) for _ in order_keys], dens()),
        "o_orderpriority": mask(rng, [rng.choice(PRIORITIES) for _ in order_keys], dens()),
    }
    line = {
        "l_orderkey": [rng.choice(order_keys) if (order_keys and rng.random() > .05)
                       else n_orders + rng.randint(1, 50) for _ in range(n_line)],
        "l_partkey": [rng.choice(part_keys) if (part_keys and rng.random() > .05)
                      else n_part + rng.randint(1, 50) for _ in range(n_line)],
        "l_suppkey": [rng.choice(supp_keys) if (supp_keys and rng.random() > .05)
                      else n_supp + rng.randint(1, 20) for _ in range(n_line)],
        "l_linenumber": [rng.randint(1, 7) for _ in range(n_line)],
        "l_quantity": (
            [None] * n_line if edge == 3 else
            mask(rng, [rng.choice(tie_quants) if (tie or rng.random() < .3)
                       else float(rng.randint(1, 50)) for _ in range(n_line)], dens())),
        "l_extendedprice": mask(rng, [money(rng, 900, 105000) for _ in range(n_line)], dens()),
        "l_discount": mask(rng, [round(rng.uniform(0, .1), 2) for _ in range(n_line)], dens()),
        "l_tax": mask(rng, [round(rng.uniform(0, .08), 2) for _ in range(n_line)], dens()),
        "l_returnflag": mask(rng, [rng.choice("ANR") for _ in range(n_line)], dens()),
        "l_linestatus": mask(rng, [rng.choice("FO") for _ in range(n_line)], dens()),
        "l_shipdate": mask(rng, [ts_us(rng) for _ in range(n_line)], dens()),
    }
    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": line}, note


EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
TS_2024 = 1704067200  # 2024-01-01 UTC, seconds

VOCAB = ("the a spark scan join sort hash merge window batch stream key "
         "order table part small fast dup plan page cache shuffle spill "
         "skew broadcast filter prune codegen stage task row").split()
LANGS = ["en", "es", "de", "fr", "it"]


def gen_documents(seed):
    """Randomized documents table: whitespace-joined tokens from a small
    vocabulary (like the fixture), with exact duplicates, near
    duplicates (a few words mutated), shingle-less short docs, and
    stratum-starved lang/source distributions."""
    rng = random.Random(seed * 104729 + 31)
    edge = seed % 8
    note = {0: "single doc", 1: "all docs identical",
            2: "all docs shorter than a shingle (<3 words)",
            3: "single source", 4: "single lang",
            5: "duplicate-heavy (half the corpus copies)",
            6: "long docs + messy whitespace", 7: "plain random"}[edge]
    n = 1 if edge == 0 else rng.randint(10, 500)
    n_src = 1 if edge == 3 else rng.randint(2, 12)
    langs = [rng.choice(LANGS)] if edge == 4 else LANGS

    def words(k):
        return [rng.choice(VOCAB) for _ in range(k)]

    def fresh_text():
        if edge == 2:
            return " ".join(words(rng.randint(1, 2)))
        hi = 1000 if edge == 6 else 160
        t = " ".join(words(rng.randint(1, hi)))
        if edge == 6 and rng.random() < 0.4:
            t = "  " + t.replace(" ", "  ", 3) + " "  # messy whitespace
        return t

    texts = []
    for i in range(n):
        if edge == 1 and texts:
            texts.append(texts[0])
        elif texts and (rng.random() < (0.5 if edge == 5 else 0.08)):
            texts.append(rng.choice(texts))            # exact duplicate
        elif texts and rng.random() < 0.15:            # near duplicate
            ws = rng.choice(texts).split(" ")
            for _ in range(rng.randint(1, 3)):
                ws[rng.randrange(len(ws))] = rng.choice(VOCAB)
            texts.append(" ".join(ws))
        else:
            texts.append(fresh_text())
    return {
        "doc_id": list(range(n)),
        "text": texts,
        "lang": [rng.choice(langs) for _ in range(n)],
        "source": [f"src{rng.randrange(n_src)}" for _ in range(n)],
        "n_chars": [len(t) for t in texts],
    }, note


def gen_events(seed, n_cust):
    """Randomized events table. The user domain overlaps the same seed's
    customer keys (so evt_asof_join's orders side genuinely matches);
    edge shapes cycle with the seed: ties in (user, ms) exercise the
    event_id tie-break every windowed op depends on."""
    rng = random.Random(seed * 7919 + 13)  # decorrelate from gen_tables
    edge = seed % 8
    note = {0: "empty events", 1: "single user", 2: "one event per user",
            3: "all-null value", 4: "duplicate-ts heavy",
            5: "single event type", 6: "null/malformed props heavy",
            7: "plain random"}[edge]
    n = 0 if edge == 0 else rng.randint(1, 6000)
    users = max(1, n_cust)
    hot = list(range(1, min(8, users) + 1))

    def pick_user(i):
        if edge == 1:
            return 1
        if edge == 2:
            return i + 1  # every event its own user
        if hot and rng.random() < 0.5:
            return rng.choice(hot)
        return rng.randint(1, users)

    # ~5-week second-resolution window → retention cohorts with k 0..3+
    def pick_ts():
        if edge == 4 and rng.random() < 0.7:
            # draw from a tiny grid so many (user, ms) pairs collide and
            # only the event_id tie-break orders them
            return (TS_2024 + 60 * rng.randint(0, 50)) * 1_000_000
        return (TS_2024 + rng.randint(0, 35 * 86400)) * 1_000_000

    def pick_props():
        r = rng.random()
        if edge == 6:
            r *= 0.5  # skew toward the degenerate shapes
        if r < 0.08:
            return None
        if r < 0.16:
            return "{}"
        if r < 0.20:
            return '{"j": %d}' % rng.randint(0, 99)
        return '{"k": %d}' % rng.randint(0, 99)

    types = [rng.choice(EVENT_TYPES)] if edge == 5 else EVENT_TYPES
    return {
        "event_id": list(range(n)),
        "ts": [pick_ts() for _ in range(n)],
        "user_id": [pick_user(i) for i in range(n)],
        "event_type": [rng.choice(types) for _ in range(n)],
        "value": ([None] * n if edge == 3 else
                  mask(rng, [money(rng, 0.01, 500.0) for _ in range(n)],
                       rng.choice([0.0, 0.05, 0.25]))),
        "props": [pick_props() for _ in range(n)],
    }, note


# arrow types mirroring the driver's testdata exactly (timestamps are
# naive micros — isAdjustedToUTC=false — like /root/testdata's files)
SCHEMAS = {
    "region": {"r_regionkey": pa.int32(), "r_name": pa.string()},
    "nation": {"n_nationkey": pa.int32(), "n_name": pa.string(),
               "n_regionkey": pa.int32()},
    "customer": {"c_custkey": pa.int64(), "c_name": pa.string(),
                 "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
                 "c_mktsegment": pa.string()},
    "supplier": {"s_suppkey": pa.int64(), "s_name": pa.string(),
                 "s_nationkey": pa.int32(), "s_acctbal": pa.float64()},
    "part": {"p_partkey": pa.int64(), "p_name": pa.string(),
             "p_brand": pa.string(), "p_type": pa.string(),
             "p_size": pa.int32(), "p_retailprice": pa.float64()},
    "orders": {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
               "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
               "o_orderdate": pa.timestamp("us"),
               "o_orderpriority": pa.string()},
    "lineitem": {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
                 "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
                 "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
                 "l_discount": pa.float64(), "l_tax": pa.float64(),
                 "l_returnflag": pa.string(), "l_linestatus": pa.string(),
                 "l_shipdate": pa.timestamp("us")},
    "events": {"event_id": pa.int64(), "ts": pa.timestamp("us"),
               "user_id": pa.int64(), "event_type": pa.string(),
               "value": pa.float64(), "props": pa.string()},
    "documents": {"doc_id": pa.int64(), "text": pa.string(),
                  "lang": pa.string(), "source": pa.string(),
                  "n_chars": pa.int64()},
}


def write_dir(tables, d):
    os.makedirs(d, exist_ok=True)
    for name, cols in tables.items():
        sch = pa.schema(list(SCHEMAS[name].items()))
        arrays = [pa.array(cols[f.name], type=f.type) for f in sch]
        pq.write_table(pa.table(arrays, schema=sch), f"{d}/{name}.parquet")
    for t in STATIC_TABLES + [t for t in ("events", "documents")
                              if t not in tables]:
        dst = f"{d}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{STATIC_DIR}/{t}.parquet", dst)


def _score_lsh(base, outd):
    """Approximate-op scoring for dedup_minhash_lsh: Spark's pair set
    must be a SUBSET of the exact-Jaccard oracle pairs (no false
    positives, same jaccard values) with recall >= 0.9."""
    import glob

    import duckdb

    # a Spark-side CRASH must never rescore to PASS: with no output
    # files got=∅ and (on a no-pairs seed) exact=∅, which would read as
    # recall 1.0 — bail on the error marker or absent parquet instead
    files = glob.glob(f"{outd}/dedup_minhash_lsh/*.parquet")
    if os.path.exists(f"{outd}/dedup_minhash_lsh/_ERROR.txt") or not files:
        return False, -1.0
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{base}/documents.parquet')")
    sql = json.load(open(f"{outd}/oracle_sql.json"))["dedup_minhash_lsh"]
    exact = set(map(tuple, con.execute(sql).fetchall()))
    rows = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    got = set(tuple(r[c] for c in ("doc_a", "doc_b", "jaccard")) for r in rows)
    recall = 1.0 if not exact else len(got & exact) / len(exact)
    return (got <= exact and recall >= 0.9), recall


def run_seed(seed, keep, family):
    base = f"/tmp/fuzz_rel/{family}_seed{seed}"
    outd = f"/tmp/fuzz_rel/{family}_out{seed}"
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(outd, ignore_errors=True)
    tables, note = gen_tables(seed)
    if family == "evt":
        ev, evt_note = gen_events(seed, len(tables["customer"]["c_custkey"]))
        tables = dict(tables, events=ev)
        # keep BOTH notes: evt_asof_join is fuzzed against the rel
        # generator's orders shape too, and the artifact should say so
        note = f"{evt_note} / rel: {note}"
    elif family in ("text", "dedup"):
        docs, doc_note = gen_documents(seed)
        tables = dict(tables, documents=docs)
        note = f"{doc_note} / rel: {note}"
    write_dir(tables, base)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", JVM_MEM="8g")
    v = subprocess.run(
        [f"{REPO}/tools/run_main.sh", "graft.Verify", base, outd,
         ",".join(FAMILIES[family])],
        capture_output=True, text=True, env=env, timeout=900)
    vline = [l for l in v.stdout.splitlines() if l.startswith("[verify]")]
    c = subprocess.run(
        [sys.executable, f"{REPO}/tools/check.py", base, outd],
        capture_output=True, text=True, timeout=300)
    m = re.search(r"== (\d+) pass, (\d+) fail ==", c.stdout)
    n_pass, n_fail = (int(m.group(1)), int(m.group(2))) if m else (0, -1)
    failed = [l.split()[1].rstrip(":") for l in c.stdout.splitlines()
              if l.startswith("FAIL")]
    extra = {}
    if "dedup_minhash_lsh" in failed:
        # MinHash-LSH is approximate BY DESIGN: banded signatures miss
        # some pairs just above the Jaccard threshold (the S-curve's
        # false-negative band) in exchange for never going all-pairs.
        # Exact equality with the exact-Jaccard oracle is a fixture
        # property, not the op's contract — under fuzz the op is scored
        # as: NO false positives, and recall >= 0.9 of the exact pairs.
        ok_lsh, recall = _score_lsh(base, outd)
        extra["lsh_recall"] = round(recall, 4)
        if ok_lsh:
            failed.remove("dedup_minhash_lsh")
            n_fail -= 1
            n_pass += 1
            extra["lsh_rescored"] = "subset+recall>=0.9 (approx-by-design)"
    row = {"seed": seed, "edge": note,
           "rows": {t: len(next(iter(cols.values()), []))
                    for t, cols in tables.items()},
           "pass": n_pass, "fail": n_fail, "failed": failed,
           "verify": vline[0] if vline else (v.stderr.splitlines() or ["?"])[-1][:200],
           **extra}
    ok = n_fail == 0 and n_pass == len(FAMILIES[family])
    if ok and not keep:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(outd, ignore_errors=True)
    if not ok:
        print(c.stdout[-2000:], file=sys.stderr)
    return row, ok


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    # a typo'd flag must fail loudly, not silently delete the scratch
    # dirs the operator asked --keep to preserve (same rule the Scala
    # instruments enforce on their mode flags)
    fam_flags = {f for f in flags if f.startswith("--family=")}
    unknown = flags - {"--keep"} - fam_flags
    if unknown:
        sys.exit(f"unknown flags {sorted(unknown)} (known: --keep, --family=rel|evt|text|dedup)")
    if len(fam_flags) > 1:
        sys.exit(f"multiple --family flags: {sorted(fam_flags)}")
    family = next(iter(fam_flags), "--family=rel").split("=", 1)[1]
    if family not in FAMILIES:
        sys.exit(f"unknown family '{family}' (known: {sorted(FAMILIES)})")
    keep = "--keep" in flags
    n = int(args[0]) if args else 24
    out = args[1] if len(args) > 1 else f"fuzz_{family}_r20.jsonl"
    all_ok = True
    # truncate: the artifact must describe exactly ONE run — appending
    # would let a later failing run's rows coexist with a committed
    # all-green record
    with open(out, "w") as f:
        for seed in range(n):
            row, ok = run_seed(seed, keep, family)
            all_ok &= ok
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(("PASS" if ok else "FAIL"), json.dumps(row))
    print("== fuzz", "ALL GREEN ==" if all_ok else "HAS FAILURES ==")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
