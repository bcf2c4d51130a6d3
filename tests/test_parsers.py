"""Source parsers (reference §2.1 S4-S8) on synthesized fixtures modeled
on the public feed formats — mirrors the reference's t/04_fetcher.t
entry-count + exact-struct assertions."""

from __future__ import annotations

import calendar

from perl_data_validate_sanctions_spark.sources.parsers import (
    parse_eu_xml,
    parse_hmt_csv,
    parse_moha_xml,
    parse_ofac_xml,
    parse_unsc_xml,
)

DATA = "/root/repo/tests/data"


def _by_first_name(df):
    return {r["names"][0]: r.asDict() for r in df.collect()}


def _e(y, m, d):
    return calendar.timegm((y, m, d, 0, 0, 0))


def test_ofac(spark):
    updated, df = parse_ofac_xml(spark, f"{DATA}/ofac.xml")
    assert updated == _e(2020, 4, 22)
    rows = _by_first_name(df)
    assert set(rows) == {"Muhammad SAEED", "Jane DOE"}  # Entity filtered out
    s = rows["Muhammad SAEED"]
    # strong aka kept, weak aka dropped (Fetcher.pm:285-286)
    assert s["names"] == ["Muhammad SAEED", "Hafiz SAEED"]
    # '05 Jun 1950' unparseable → dob_text; '1951' → year
    assert s["dob_text"] == ["05-Jun-1950"]
    assert s["dob_year"] == [1951]
    assert s["place_of_birth"] == ["pk"]  # last comma-part 'Pakistan' → pk
    assert s["citizen"] == ["pk"]
    assert s["residence"] == ["pk"]
    assert s["postal_code"] == ["54000"]
    assert s["passport_no"] == ["BE5978421"]
    assert s["national_id"] == ["23250460642"]
    j = rows["Jane DOE"]
    assert j["dob_epoch"] == [_e(1962, 4, 2)]


def test_hmt(spark):
    updated, df = parse_hmt_csv(spark, f"{DATA}/hmt.csv")
    assert updated == _e(2020, 4, 27)
    rows = _by_first_name(df)
    # Entity row filtered
    assert set(rows) == {"HOJATI Mohsen", "SMITH John Q"}
    h = rows["HOJATI Mohsen"]
    assert "محسن حجتی" in h["names"]  # non-latin alias column
    assert h["dob_epoch"] == [_e(1955, 9, 28)]  # 28/09/1955 D/M/Y
    assert h["passport_no"] == ["G4506013"]
    # 'Iran (Islamic Republic of)' → trailing parenthetical stripped →
    # 'Iran ' → trimmed → ir
    assert h["residence"] == ["ir"]
    sm = rows["SMITH John Q"]
    # '(notes)' parenthetical stripped from the name cell
    assert sm["names"] == ["SMITH John Q"]
    assert sm["dob_year"] == [1970]  # 00/00/1970 zero-date rule
    assert sm["place_of_birth"] == ["fr"]
    assert sm["national_id"] == ["NI-123"]
    assert sm["postal_code"] == ["75001"]


def test_eu(spark):
    updated, df = parse_eu_xml(spark, f"{DATA}/eu.xml")
    assert updated == _e(2020, 4, 15)
    rows = df.collect()
    assert len(rows) == 1  # enterprise filtered
    r = rows[0].asDict()
    # every alias counts, strong or not; empty first → ' Lemine' → trimmed
    assert r["names"] == ["Abid Hammadou", "Lemine"]
    assert r["dob_epoch"] == [_e(1958, 12, 12)]
    assert r["dob_year"] == [1959]
    assert r["place_of_birth"] == ["dz"]
    assert r["citizen"] == ["ml"]
    assert r["residence"] == ["ml"]
    assert r["postal_code"] == ["100"]
    assert r["nationality"] == ["ml", "dz"]
    assert r["passport_no"] == ["P-123"]
    assert r["national_id"] == ["ID-9"]


def test_unsc(spark):
    updated, df = parse_unsc_xml(spark, f"{DATA}/unsc.xml")
    assert updated == _e(2024, 2, 13)
    rows = _by_first_name(df)
    assert set(rows) == {"RI", "HAMZA"}
    ri = rows["RI"]
    # name PARTS + original script + alias are separate names
    assert ri["names"] == ["RI", "WON HO", "리원호", "Ri Won-ho"]
    assert ri["dob_epoch"] == [_e(1964, 7, 17)]
    assert ri["residence"] == ["sy"]
    assert ri["nationality"] == ["kp"]
    assert ri["citizen"] == ["kp"]
    assert ri["passport_no"] == ["381310014"]
    assert ri["place_of_birth"] == ["kp"]  # 'Pyongyang' unknown, 'DPRK' → kp
    hamza = rows["HAMZA"]
    assert hamza["dob_year"] == [1972, 1975]  # BETWEEN → endpoints only


def test_moha(spark):
    updated, df = parse_moha_xml(spark, f"{DATA}/moha.xml")
    assert updated is None  # feed carries no publish date
    rows = _by_first_name(df)
    assert set(rows) == {"ABDUL HAMID", "SOME GROUP"}  # '-' name dropped
    a = rows["ABDUL HAMID"]
    assert a["names"] == ["ABDUL HAMID", "Abu Hamid"]
    # d.m.yyyy dots are NOT date-parseable → dob_text (faithful)
    assert a["dob_text"] == ["12.10.1970", "1.1.1971"]
    assert a["nationality"] == ["my"]
    assert a["passport_no"] == ["A123", "B456"]
    assert a["national_id"] == ["701012-02-5552"]
    g = rows["SOME GROUP"]
    assert g["names"] == ["SOME GROUP", "SG"]  # '-' other-name dropped


def test_moha_legacy(spark):
    """The legacy TaggedPDF-doc format, pinned against the reference's
    own sample feed and golden assertions (t/04_fetcher.t:467-494);
    parse_moha_xml must dispatch to the legacy parser by root element
    (Fetcher.pm:561-579)."""
    updated, df = parse_moha_xml(
        spark, "/root/reference/t/data/sample_moha.xml"
    )
    # publish date 2025-02-04T17:53:20+08:00 → epoch of 2025-02-04 UTC
    assert updated == 1738627200
    rows = df.collect()
    assert len(rows) == 77  # t/04_fetcher.t:481

    by_any_name = {}
    for r in rows:
        for n in r["names"]:
            by_any_name[n] = r
    zahar = by_any_name["Zahar bin Abdullah"]
    assert zahar["names"] == ["Zahar bin Abdullah", "Abu Zahar"]
    # found by alias too, same entry (t/04_fetcher.t:487)
    assert by_any_name["Abu Zahar"] is zahar
    assert zahar["dob_text"] == ["24.4.1981"]

    # multiple <P> blocks in one DOB cell → multiple dob_text values
    alhmidan = by_any_name["Mohamad Alsaied Alhmidan"]
    assert alhmidan["dob_text"] == [
        "20.2.1976", "13.2.1975", "15.2.1976", "7.1.1977"
    ]
