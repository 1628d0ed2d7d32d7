"""Grep-style lint (no Spark): forbid attribute-access equality on the
SAME column name between two DataFrame variables, e.g.

    purchases.join(touches, purchases.user_id == touches.user_id)

When both legs derive from one source DataFrame, Spark logs
"Constructing trivially true equals predicate" and resolves the join via
dataset-id disambiguation — which works today but silently degrades to a
cross join under refactoring (seen and fixed in
q_label_centroid_similarity, commit da5eba6, and q_last_touch_attribution,
round 6). The safe idiom is to rename the key on one side and join on
the RENAMED column, which this lint can't match.
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "dataintegration_csvprovider_spark"

# var.col == othervar.col with an identical column name on both sides;
# \2 backreference needs PCRE — python re supports it natively
PATTERN = re.compile(
    r"\b([a-zA-Z_]\w*)\.([a-zA-Z_]\w*)\s*==\s*([a-zA-Z_]\w*)\.\2\b"
)


def test_no_same_name_attribute_equality_joins():
    hits = []
    for path in sorted(PKG.rglob("*.py")):
        for lineno, line in enumerate(
            path.read_text().splitlines(), start=1
        ):
            m = PATTERN.search(line)
            # F.col("a") == F.col("a") won't match (quoted); self-compare
            # x.y == x.y (same var) is a genuine bug too — keep it in
            if m:
                hits.append(f"{path.relative_to(PKG.parent)}:{lineno}: {line.strip()}")
    assert not hits, (
        "same-column attribute-equality join predicates found (rename "
        "the key on one side instead — 'trivially true equals' hazard):\n"
        + "\n".join(hits)
    )
