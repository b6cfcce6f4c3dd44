#!/usr/bin/env python3
"""Splice freshly generated BPE VALUES (gen_bpe_oracle.py stdout, run
against an ALTERNATE corpus) into a Verify dump's oracle_sql.json, in
place. The q_bpe_merges / q_bpe_encode oracles are fixture-bound VALUES
literals by design (BPE's sequential merge loop is not SQL-expressible;
an independent Python twin embeds its result) — so an alternate-seed
oracle batch must regenerate exactly those two entries and nothing else.

Usage: python3 tools/patch_bpe_oracle.py <gen_bpe_stdout.txt> <oracle_sql.json>
"""
import json
import re
import sys


def main(frag_path, json_path):
    frag = open(frag_path).read()
    m = re.search(
        r"-- q_bpe_merges VALUES.*?:\n(.*?)\n\n-- word-units VALUES.*?:\n(.*)",
        frag, re.S)
    if not m:
        sys.exit("gen_bpe_oracle output did not contain both fragments")
    merges = m.group(1).strip()
    words = m.group(2).strip()

    d = json.load(open(json_path))
    before = (d["q_bpe_merges"], d["q_bpe_encode"])
    d["q_bpe_merges"] = re.sub(
        r"(?s)(FROM \(VALUES\n).*?(\) t\(\")",
        lambda mm: mm.group(1) + merges + "\n" + mm.group(2),
        d["q_bpe_merges"], count=1)
    d["q_bpe_encode"] = re.sub(
        r"(?s)(AS \(VALUES\n).*?tok AS",
        lambda mm: mm.group(1) + words + "),\ntok AS",
        d["q_bpe_encode"], count=1)
    if (d["q_bpe_merges"], d["q_bpe_encode"]) == before:
        sys.exit("patch was a no-op — oracle SQL template drifted?")
    json.dump(d, open(json_path, "w"), indent=1)
    print(f"[patch-bpe] regenerated VALUES spliced into {json_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
