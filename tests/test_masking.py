"""Golden-vector tests for the masking expression library (SURVEY §2.1)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dbt_gdpr_anonymizer_spark.functions import masking

SALT = "dev_salt_UNSAFE"


def expected_email(e: str, salt: str = SALT, domain: str = "anonymized.gouv.fr") -> str:
    h = hashlib.sha256((e.strip().lower() + salt).encode()).hexdigest()
    return f"user_{h[:16]}@{domain}"


def one(spark, col, value, typ="string"):
    return spark.createDataFrame([(value,)], f"v {typ}").select(col.alias("r")).collect()[0]["r"]


def test_mask_email_golden(spark):
    assert one(spark, masking.mask_email("v", SALT), "test1@example.fr") == expected_email(
        "test1@example.fr"
    )
    # trim+lower applied before hashing
    assert one(spark, masking.mask_email("v", SALT), "  TEST1@Example.FR ") == expected_email(
        "test1@example.fr"
    )


def test_mask_email_null_guard(spark):
    assert one(spark, masking.mask_email("v", SALT), None) is None
    assert one(spark, masking.mask_email("v", SALT), "") is None


def test_mask_phone(spark):
    # the reference quirk: '+33 1 ' + mask => double space
    assert (
        one(spark, masking.mask_phone("v"), "+33 1 23 45 67 89")
        == "+33 1  XX XX XX XX"
    )
    assert one(spark, masking.mask_phone("v"), "0123456789") == "012345 XX XX XX XX"
    assert one(spark, masking.mask_phone("v"), "") is None
    assert one(spark, masking.mask_phone("v"), None) is None


def test_mask_coordinates(spark):
    assert one(spark, masking.mask_coordinates("v"), 48.8566, "double") == 48.86
    assert one(spark, masking.mask_coordinates("v"), 43.2965, "double") == 43.3
    assert one(spark, masking.mask_coordinates("v"), None, "double") is None
    assert one(spark, masking.mask_coordinates("v", 3), 48.8566, "double") == 48.857


def test_geohash(spark):
    df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
    r = df.select(masking.create_geohash("lat", "lon").alias("g")).collect()[0]["g"]
    assert r == "geo_48.86_2.35"
    # trailing zero preserved through decimal rendering
    df2 = spark.createDataFrame([(48.9, 2.0)], "lat double, lon double")
    r2 = df2.select(masking.create_geohash("lat", "lon").alias("g")).collect()[0]["g"]
    assert r2 == "geo_48.90_2.00"


def test_haversine(spark):
    # Paris -> Marseille ≈ 660 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 43.2965, 5.3698)], "a double, b double, c double, d double"
    )
    km = df.select(
        masking.haversine_distance("a", "b", "c", "d").alias("km")
    ).collect()[0]["km"]
    assert abs(km - 660.9) < 1.5
    # zero distance
    df0 = spark.createDataFrame([(1.0, 2.0, 1.0, 2.0)], "a double, b double, c double, d double")
    assert df0.select(masking.haversine_distance("a", "b", "c", "d").alias("km")).collect()[0]["km"] == 0.0


def test_extract_country_code(spark):
    assert one(spark, masking.extract_country_code("v"), "+33 1 23 45 67 89") == "+33 "
    assert one(spark, masking.extract_country_code("v"), "0123456789") is None


def test_normalize_and_validate_phone(spark):
    assert one(spark, masking.normalize_phone("v"), " +33 1-23.45(67 89 ") == "+33123456789"
    assert one(spark, masking.is_valid_phone("v"), "+33 1 23 45 67 89", "string") is True
    assert one(spark, masking.is_valid_phone("v"), "0123456789") is True
    assert one(spark, masking.is_valid_phone("v"), "12345") is False
    assert one(spark, masking.is_valid_phone("v"), "+33 1") is False


def test_email_validation_and_domain(spark):
    assert one(spark, masking.is_valid_email("v"), "a@b.fr") is True
    assert one(spark, masking.is_valid_email("v"), "a@b") is False
    assert one(spark, masking.extract_email_domain("v"), "Jean@Mairie.FR") == "mairie.fr"
    assert one(spark, masking.extract_email_domain("v"), "not-an-email") is None


def test_valid_coordinates(spark):
    df = spark.createDataFrame(
        [(48.8, 2.3), (91.0, 0.0), (0.0, 181.0), (None, 2.0)],
        "lat double, lon double",
    )
    r = [x["ok"] for x in df.select(masking.are_valid_coordinates("lat", "lon").alias("ok")).collect()]
    assert r == [True, False, False, None] or r == [True, False, False, False]


def test_surrogate_key(spark):
    expected = hashlib.md5(b"TEST001").hexdigest()
    assert one(spark, masking.surrogate_key("v"), "TEST001") == expected
    null_sentinel = hashlib.md5(b"_dbt_utils_surrogate_key_null_").hexdigest()
    assert one(spark, masking.surrogate_key("v"), None) == null_sentinel


def test_suppress(spark):
    assert one(spark, masking.suppress("v"), "anything") is None


def test_luhn_check_known_vectors(spark):
    """Known-valid test PANs pass; any single-digit corruption fails; the
    classic 79927398713 example validates."""
    from dbt_gdpr_anonymizer_spark.functions.masking import luhn_check

    valid = [
        "4539578763621486",
        "4111111111111111",
        "5500005555555559",
        "340000000000009",
        "6011000990139424",
        "79927398713",
    ]
    rows = [(v, True) for v in valid] + [
        (v[:-1] + str((int(v[-1]) + 1) % 10), False) for v in valid
    ]
    df = spark.createDataFrame([(c,) for c, _ in rows], ["cc"])
    got = [r["ok"] for r in df.select(luhn_check("cc").alias("ok")).collect()]
    assert got == [e for _, e in rows]


def test_iban_valid(spark):
    from dbt_gdpr_anonymizer_spark.functions.masking import iban_valid

    cases = [
        ("GB29NWBK60161331926819", True),
        ("DE89370400440532013000", True),
        ("FR1420041010050500013M02606", True),  # letter mid-BBAN
        ("GB29NWBK60161331926810", False),  # corrupted last digit
        ("GB29NWBK6016133192681", False),  # wrong length for mod-97? still run
        ("XX0012345678901", False),  # bad checksum
        ("1229NWBK60161331926819", False),  # digits where letters required
        ("gb29nwbk60161331926819", True),  # case-insensitive (upper applied)
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "iban string")
    got = [r.v for r in df.select(iban_valid("iban").alias("v")).collect()]
    assert got == [e for _, e in cases]


def test_generalize_date(spark):
    from dbt_gdpr_anonymizer_spark.functions.masking import generalize_date
    import pytest as _pytest

    df = spark.createDataFrame(
        [("2024-05-17",), (None,)], "d string"
    ).select(F.to_timestamp("d").alias("d"))
    out = df.select(
        generalize_date("d", "month").alias("m"),
        generalize_date("d", "quarter").alias("q"),
        generalize_date("d", "year").alias("y"),
    ).collect()
    assert str(out[0].m) == "2024-05-01 00:00:00"
    assert str(out[0].q) == "2024-04-01 00:00:00"
    assert str(out[0].y) == "2024-01-01 00:00:00"
    assert out[1].m is None and out[1].q is None and out[1].y is None
    with _pytest.raises(ValueError):
        generalize_date("d", "day")


def test_nir_valid_accepts_valid_rejects_corrupt(spark):
    from dbt_gdpr_anonymizer_spark.functions.masking import nir_valid
    from pyspark.sql import functions as F

    cases = [
        ("185027510812332", True),   # computed mod-97 key
        ("185027510812333", False),  # key off by one
        ("385027510812332", False),  # bad sex digit
        ("85027510812332", False),   # 14 digits
        ("1850275108123321", False), # 16 digits
    ]
    df = spark.createDataFrame(cases, "s string, want boolean")
    out = df.select("want", nir_valid(F.col("s")).alias("got")).collect()
    assert all(r.want == r.got for r in out)


def test_fpe_digits_format_preserving_bijection(spark):
    from dbt_gdpr_anonymizer_spark.functions.masking import fpe_digits
    from pyspark.sql import functions as F
    import re

    phones = ["+33 1 23 45 67 89", "0555123456", "12345", "no-digits!"]
    df = spark.createDataFrame([(p,) for p in phones], "p string")
    out = {r.p: r.m for r in df.select(
        "p", fpe_digits("p", "salt_a").alias("m")).collect()}
    for p, m in out.items():
        # format preserved exactly: non-digits untouched, digits stay digits
        assert re.sub(r"[0-9]", "#", p) == re.sub(r"[0-9]", "#", m)
    assert out["no-digits!"] == "no-digits!"
    assert out["+33 1 23 45 67 89"] != "+33 1 23 45 67 89"  # non-identity
    # deterministic across invocations; distinct same-shape inputs stay
    # distinct (per-position digit shift is a bijection on digits)
    again = {r.p: r.m for r in df.select(
        "p", fpe_digits("p", "salt_a").alias("m")).collect()}
    assert again == out
    a, b = "0555123456", "0555123457"
    ma, mb = out.get(a), {r.m for r in spark.createDataFrame(
        [(b,)], "p string").select(fpe_digits("p", "salt_a").alias("m")).collect()}
    assert ma not in mb
    # different salt -> different keystream
    other = {r.p: r.m for r in df.select(
        "p", fpe_digits("p", "salt_b").alias("m")).collect()}
    assert other["0555123456"] != out["0555123456"]
