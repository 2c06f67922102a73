#!/usr/bin/env python3
"""Generate OPERATORS.md — the per-operator product surface table.

Sources of truth:
  * operator list + oracle kind: a `graft.Verify` dump's oracle_sql.json
    (every registered op has an oracle entry; the dump IS the registry)
  * streaming operator list: SURVEY.md §2.D (spec-verified, no oracle)
  * one-line semantics: SURVEY.md §2 tables (name -> "what" column)

Usage: python3 tools/gen_operators_md.py [verify_out_dir]
Exits non-zero if any registered operator lacks a description — the
table must stay complete as operators are added.
"""
import json, os, re, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VERIFY = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"

# descriptions for ops whose SURVEY row covers several names at once, or
# that are listed outside the §2 tables (the "extras" past the checklist)
SUPPLEMENT = {
    "agg_cube": "CUBE over region x mktsegment revenue",
    "q4_order_priority": "TPC-H Q4 order-priority count via EXISTS semi-join",
    "q13_cust_distribution": "TPC-H Q13 customer order-count distribution (outer join)",
    "q17_below_avg_parts": "TPC-H Q17 small-quantity avg via decorrelated per-part subquery",
    "q18_large_orders": "TPC-H Q18 large-volume customers (HAVING over join)",
    "dv_sat_link_orders": "link satellite: order attributes orbiting the order-customer link",
    "dv_bridge_customer_revenue": "DV 2.0 bridge: customer->orders->revenue pre-joined shortcut table",
    "dv_go_build_bucketed": "bucketed vault lifecycle E2E: go(bucketed) + two shifted-key micro-batches (second idempotent) + compaction + re-query through the bucketed catalog tables",
}

def parse_survey():
    txt = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"## §2.*?(?=\n## §3)", txt, re.S)
    body = m.group(0)
    # section splits
    sections = re.split(r"\n### ", body)
    descs, section_of = {}, {}
    sec_titles = {}
    for sec in sections[1:]:
        title = sec.split("\n", 1)[0].strip()
        key = title[0]  # A/B/C/D
        sec_titles[key] = title
        for line in sec.splitlines():
            if not line.startswith("|") or line.startswith("|--") or "| name |" in line.replace("---", ""):
                continue
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) < 3:
                continue
            names = re.findall(r"`([a-z0-9_]+)`", cells[1])
            what = cells[2]
            what = re.sub(r"\s+", " ", what).strip()
            for n in names:
                if n not in descs:
                    descs[n] = what
                    section_of[n] = key
    return descs, section_of, sec_titles

def main():
    descs, section_of, sec_titles = parse_survey()
    oracle = json.load(open(os.path.join(VERIFY, "oracle_sql.json")))
    batch_ops = sorted(oracle.keys())
    stream_ops = sorted(n for n, s in section_of.items() if s == "D")

    missing = [n for n in batch_ops if n not in descs and n not in SUPPLEMENT]
    if missing:
        sys.stderr.write("ERROR: no description for: %s\n" % ", ".join(missing))
        sys.exit(1)

    # --- SURVEY §2 <-> registry agreement (round-7 verdict item 7) ---
    # §2 is the coverage CONTRACT: every registered oracle op must have a
    # §2 row (SUPPLEMENT supplies wording, never absolution), no §2 row
    # may claim an op the registry does not carry, and every section
    # header's advertised count must equal its actual row count — so the
    # doc can never silently drift from the code again.
    abc_names = {n for n, s in section_of.items() if s in "ABC"}
    no_row = sorted(set(batch_ops) - abc_names)
    phantom = sorted(abc_names - set(batch_ops))
    if no_row:
        sys.stderr.write("ERROR: registered ops missing a SURVEY §2 row: %s\n" % ", ".join(no_row))
        sys.exit(1)
    if phantom:
        sys.stderr.write("ERROR: SURVEY §2 rows with no registered op: %s\n" % ", ".join(phantom))
        sys.exit(1)
    for key, title in sec_titles.items():
        m = re.search(r"(\d+)\s+(?:checked\s+)?ops", title)
        if not m:
            sys.stderr.write("ERROR: no op count in §2.%s header: %s\n" % (key, title))
            sys.exit(1)
        claimed = int(m.group(1))
        actual = sum(1 for s in section_of.values() if s == key)
        if claimed != actual:
            sys.stderr.write("ERROR: §2.%s header claims %d ops but lists %d\n"
                             % (key, claimed, actual))
            sys.exit(1)

    def desc(n):
        d = SUPPLEMENT.get(n) or descs[n]
        # keep the table line readable: first sentence-ish clause, <= 220 chars
        if len(d) > 220:
            cut = d[:220]
            d = cut[:cut.rfind(" ")] + " …"
        return d

    groups = {"A": [], "B": [], "C": [], "D": []}
    for n in batch_ops:
        groups[section_of[n] if n in section_of else guess_group(n)].append(n)
    for n in stream_ops:
        # a §D op that also has an oracle entry is already grouped above —
        # appending it again would emit the row twice
        if n not in batch_ops:
            groups["D"].append(n)

    titles = {
        "A": "Data-Vault engine",
        "B": "Warehouse analytics",
        "C": "LLM-pipeline (dedup / similarity / text / curation / retrieval / multimodal)",
        "D": "Structured Streaming",
    }
    out = []
    out.append("# graft operators\n")
    out.append("GENERATED by `tools/gen_operators_md.py` from the operator registry")
    out.append("(`SparkEntry.queries` via a `graft.Verify` dump) and SURVEY.md §2 —")
    out.append("edit those, then regenerate. Oracle kinds:\n")
    out.append("- **DuckDB hash** — the driver runs the op's `oracleSql` twin in DuckDB")
    out.append("  over the same parquet and compares row count + schema + sorted value")
    out.append("  hash (the strictest check).")
    out.append("- **spec** — Structured Streaming ops: MemoryStream/file-source ScalaTest")
    out.append("  specs pinning batch parity, state bounds, and replay behavior.\n")
    total_batch = len(batch_ops)
    total_stream = len(stream_ops)
    out.append(f"**{total_batch + total_stream} operators: {total_batch} oracle-checked + {total_stream} streaming.**\n")
    for key in "ABCD":
        ops = groups[key]
        if not ops:
            continue
        kind = "spec" if key == "D" else "DuckDB hash"
        out.append(f"## {titles[key]} ({len(ops)} ops)\n")
        out.append("| operator | oracle | semantics |")
        out.append("|---|---|---|")
        for n in ops:
            out.append(f"| `{n}` | {kind} | {desc(n)} |")
        out.append("")
    path = os.path.join(REPO, "OPERATORS.md")
    open(path, "w").write("\n".join(out) + "\n")
    print(f"wrote {path}: {total_batch} batch + {total_stream} streaming ops")

def guess_group(n):
    return "A" if n.startswith("dv_") else "B"

if __name__ == "__main__":
    main()
