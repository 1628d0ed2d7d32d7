"""PII operator unit pins (operators/pii.py): Luhn test vectors, IPv4
octet-range edges, chain-order overlap resolution under redaction, and
the anneal mixture's budget-conservation laws."""

import pytest
from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.pii import (
    PII_PATTERNS,
    pii_audit,
    pii_redact,
)


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


# Published Luhn vectors: valid card numbers from the test-card lists,
# plus single-digit corruptions (Luhn detects every single-digit error).
LUHN_VALID = [
    "4532015112830366",  # visa-shaped 16
    "4111111111111111",
    "5500005555555559",
    "340000000000009",  # amex-shaped 15
    "6011000990139424",
    "30569309025904",  # diners-shaped 14
    "4222222222222",  # visa-shaped 13
]
LUHN_INVALID = [
    "4532015112830367",  # last digit off by one
    "4111111111111112",
    "1234567890123456",
    "9999999999999999",
    "4222222222223",
]


@pytest.mark.parametrize("card", LUHN_VALID)
def test_luhn_accepts_published_vectors(spark, card):
    out = (
        pii_audit(_one(spark, f"pay {card} now"))
        .select("n_card_candidates", "n_card_valid")
        .first()
    )
    assert out.n_card_candidates == 1
    assert out.n_card_valid == 1


@pytest.mark.parametrize("card", LUHN_INVALID)
def test_luhn_rejects_corrupted_vectors(spark, card):
    out = (
        pii_audit(_one(spark, f"pay {card} now"))
        .select("n_card_candidates", "n_card_valid", "n_card_luhn_fail")
        .first()
    )
    assert out.n_card_candidates == 1
    assert out.n_card_valid == 0
    assert out.n_card_luhn_fail == 1


def test_card_length_boundaries(spark):
    # 12 digits: below the candidate floor; 17: above the ceiling — the
    # word-boundary anchors refuse a partial match inside a longer run
    out = pii_audit(
        _one(spark, "a 123456789012 b 12345678901234567 c")
    ).first()
    assert out.n_card_candidates == 0


def test_ipv4_octet_range(spark):
    txt = "ok 192.168.0.1 and 255.255.255.255 bad 256.1.1.1 and 10.400.0.1"
    out = pii_audit(_one(spark, txt)).first()
    assert out.n_ip_candidates == 4
    assert out.n_ip_valid == 2


def test_email_and_phone_counts(spark):
    txt = "a@b.co x.y_z%q+1@ex-ample.org call 555-123-4567 not 55-123-4567"
    out = pii_audit(_one(spark, txt)).first()
    assert out.n_email == 2
    assert out.n_phone == 1
    assert out.has_pii


def test_clean_text_has_no_pii(spark):
    out = pii_audit(_one(spark, "just words and 42 numbers 7.5 here")).first()
    assert not out.has_pii


def test_redaction_masks_every_class_once(spark):
    txt = "mail a@b.co ip 10.0.0.1 tel 555-123-4567 card 4111111111111111 ."
    row = pii_redact(_one(spark, txt)).first()
    assert row.redacted == "mail <EMAIL> ip <IP> tel <PHONE> card <CARD> ."
    assert row.n_redacted == 4


def test_redaction_is_conservative_on_lookalikes(spark):
    # invalid octet + Luhn-failing card are still masked (scrub posture)
    row = pii_redact(_one(spark, "x 999.1.1.1 y 1234567890123456 z")).first()
    assert row.redacted == "x <IP> y <CARD> z"


def test_redaction_counts_overlapping_candidate_once(spark):
    # '@' is a word boundary, so a card-shaped email local part matches
    # both the email and the card pattern on the ORIGINAL text — but the
    # email mask consumes it first, and n_redacted counts each stage
    # against the chain input, so exactly one mask is counted.
    row = pii_redact(_one(spark, "mail 4111111111111111@x.co end")).first()
    assert row.redacted == "mail <EMAIL> end"
    assert row.n_redacted == 1
    # same for a phone-shaped local part
    row = pii_redact(_one(spark, "mail 555-123-4567@x.co end")).first()
    assert row.redacted == "mail <EMAIL> end"
    assert row.n_redacted == 1


def test_redaction_count_matches_audit(spark):
    txt = "a@b.co c@d.org 10.0.0.1 555-000-1111 4111111111111111"
    audit = pii_audit(_one(spark, txt)).first()
    red = pii_redact(_one(spark, txt)).first()
    total = (
        audit.n_email
        + audit.n_phone
        + audit.n_ip_candidates
        + audit.n_card_candidates
    )
    assert red.n_redacted == total == 5
    for _, mask in PII_PATTERNS.values():
        assert mask in red.redacted


def test_mixture_anneal_budget_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import q_mixture_anneal

    rows = q_mixture_anneal(spark, sf_dir).collect()
    assert rows, "anneal plan is empty"
    for phase, share in ((1, 0.6), (2, 0.15)):
        p = [r for r in rows if r.phase == phase]
        total_avail = sum(r.avail_chars for r in p)
        budget = sum(r.char_budget for r in p)
        # Hamilton apportionment hits the phase total exactly unless the
        # availability cap binds; never exceeds it
        assert budget <= int(share * total_avail) + 1
        for r in p:
            assert 0 <= r.char_budget <= r.avail_chars
            assert 0.0 <= r.budget_frac <= 1.0
        w = sum(r.weight for r in p)
        assert abs(w - 1.0) < 1e-9, f"phase {phase} weights sum to {w}"


def test_url_canonicalize_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_url_canonicalize,
    )

    rows = q_url_canonicalize(spark, sf_dir).collect()
    assert rows
    canon = {}
    for r in rows:
        # canonical strings never retain the stripped artifacts
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url
        assert "www." not in r.canonical_url
        assert ":80/" not in r.canonical_url
        assert r.canonical_url == r.canonical_url.lower()
        canon.setdefault(r.canonical_url, []).append(r)
    # exactly one keeper per canonical form, and it is the min doc_id
    for url, group in canon.items():
        keepers = [g for g in group if g.is_kept]
        assert len(keepers) == 1, url
        assert keepers[0].doc_id == min(g.doc_id for g in group)
    # the non-default port survives canonicalization
    assert any(":8080" in u for u in canon)
    # blocklist verdict is exactly the host membership
    for r in rows:
        assert r.is_blocked == (r.host in
                                ("blocked0.net", "blocked1.net",
                                 "blocked2.net"))


def test_robots_filter_precedence(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import q_robots_filter

    rows = q_robots_filter(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add((r.matched_rule != "", r.allowed))
        if r.host.startswith("blocked"):
            assert r.matched_rule == "/" and not r.allowed
        if r.matched_rule == "":
            # default-allow exists only where no rule governs: hosts
            # without a Disallow (index >= 15) or the :8080 authorities
            # (robots rules bind per host:port — RFC 9309)
            assert r.allowed
            assert (
                ":8080" in r.host
                or int(r.host.removeprefix("example").split(".")[0]) >= 15
            )
        if r.matched_rule.startswith("/path/"):
            # the longer Allow wins over the short Disallow
            assert r.allowed and r.rule_len == 7
    # all three regimes present: matched-deny, matched-allow, default
    assert (True, False) in seen
    assert (True, True) in seen
    assert (False, True) in seen
