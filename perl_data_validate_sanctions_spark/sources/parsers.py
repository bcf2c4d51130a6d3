"""The six source parsers (reference §2.1 S4-S8) re-expressed as Spark
readers: native ``spark.read.format("xml")`` / ``csv`` scans + Column
expressions into the raw-entry shape that ``normalize_entries``
(the ``_process_sanction_entry`` funnel) consumes.

Fidelity notes per source (reference lines cited inline):

- OFAC XML (Fetcher.pm:258-328): keep ``sdnType == 'Individual'``;
  names = main first+last plus akas whose ``category`` is 'strong'
  (missing category defaults to strong); place_of_birth takes the last
  comma-part; id list splits Passport vs National ID; publish date is
  ``publshInformation/Publish_Date`` (typo faithful) in M/D/Y.
- HMT CSV (Fetcher.pm:330-395): row 1 carries the update date, row 2
  the header; every cell is trimmed and has a trailing ``(...)``
  stripped; keep ``Group Type == 'Individual'``; name = first six
  columns joined; nationality deliberately ignored (stored as
  adjective); optional Passport Number / Non-Latin alias columns.
- EU XML (Fetcher.pm:397-454): keep ``subjectType@code == 'person'``;
  every nameAlias contributes (wholeName, else first+last — the strong
  flag is NOT filtered on); dob = @birthdate else @year per birthdate
  node; ids split on identificationTypeCode id/passport; publish date
  from export@generationDate.
- UNSC XML (Fetcher.pm:456-553): the four name parts + original-script
  name + aliases are each separate names; BETWEEN dob becomes
  [FROM_YEAR, TO_YEAR]; documents split Passport vs National
  Identification Number. (Divergence, documented: the reference's
  ``my @national_id = [];`` pushes a Perl arrayref into the list,
  serializing as an address-dependent ``ARRAY(0x...)`` string — a bug
  we do not reproduce; we emit an empty list.)
- MOHA XML v2 (Fetcher.pm:587-669): per-entry field map keyed by
  normalized label; individuals are rows with a ``(6) Date of Birth``
  field; DOBs are every ``d.m.yyyy`` match; passports split on ``/``.

Each parser returns ``(updated_epoch, normalized_entries_df)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dates import date_to_epoch
from ..functions.normalize import process_name, strip_trailing_parenthetical
from .entries import normalize_entries

_S = T.StringType()


def _arr(*fields: tuple[str, T.DataType]) -> T.ArrayType:
    return T.ArrayType(T.StructType([T.StructField(n, t, True) for n, t in fields]))


def _empty_sarr():
    return F.array().cast("array<string>")


def _nz(c):  # '' and NULL both mean absent in these feeds
    return F.filter(c, lambda x: x.isNotNull() & (x != ""))


def _finish(raw: DataFrame, source: str) -> DataFrame:
    return normalize_entries(raw.withColumn("source", F.lit(source)))


# --------------------------------------------------------------- OFAC ---

OFAC_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("sdnType", _S, True),
        T.StructField("firstName", _S, True),
        T.StructField("lastName", _S, True),
        T.StructField(
            "akaList",
            T.StructType(
                [
                    T.StructField(
                        "aka",
                        _arr(("category", _S), ("firstName", _S), ("lastName", _S)),
                        True,
                    )
                ]
            ),
            True,
        ),
        T.StructField(
            "dateOfBirthList",
            T.StructType(
                [T.StructField("dateOfBirthItem", _arr(("dateOfBirth", _S)), True)]
            ),
            True,
        ),
        T.StructField(
            "placeOfBirthList",
            T.StructType(
                [T.StructField("placeOfBirthItem", _arr(("placeOfBirth", _S)), True)]
            ),
            True,
        ),
        T.StructField(
            "citizenshipList",
            T.StructType([T.StructField("citizenship", _arr(("country", _S)), True)]),
            True,
        ),
        # 'naationalityList' typo is in the real OFAC feed (Fetcher.pm:300)
        T.StructField(
            "naationalityList",
            T.StructType([T.StructField("nationality", _arr(("country", _S)), True)]),
            True,
        ),
        T.StructField(
            "addressList",
            T.StructType(
                [
                    T.StructField(
                        "address", _arr(("country", _S), ("postalCode", _S)), True
                    )
                ]
            ),
            True,
        ),
        T.StructField(
            "idList",
            T.StructType(
                [T.StructField("id", _arr(("idType", _S), ("idNumber", _S)), True)]
            ),
            True,
        ),
    ]
)


def parse_ofac_xml(
    spark: SparkSession, path: str, source: str = "OFAC-SDN"
) -> tuple[int | None, DataFrame]:
    header = (
        spark.read.format("xml")
        .option("rowTag", "publshInformation")
        .load(path)
        .select(F.col("Publish_Date").cast("string").alias("d"))
        .collect()
    )
    updated = None
    if header:
        # M/D/Y → Y-M-D (Fetcher.pm:264-266)
        import re

        m = re.search(r"(\d{1,2})/(\d{1,2})/(\d{4})", header[0]["d"] or "")
        if m:
            mm, dd, yy = m.groups()
            row = (
                spark.range(1)
                .select(date_to_epoch(F.lit(f"{yy}-{int(mm):02d}-{int(dd):02d}")))
                .collect()
            )
            updated = row[0][0]

    df = (
        spark.read.format("xml")
        .option("rowTag", "sdnEntry")
        .schema(OFAC_ENTRY_SCHEMA)
        .load(path)
        .filter(F.col("sdnType") == "Individual")
    )
    akas = F.coalesce(F.col("akaList.aka"), F.array().cast(
        "array<struct<category:string,firstName:string,lastName:string>>"
    ))
    strong_akas = F.filter(
        akas, lambda a: F.coalesce(a["category"], F.lit("strong")) == "strong"
    )
    names = F.concat(
        F.array(
            process_name(
                F.coalesce(F.col("firstName"), F.lit("")),
                F.coalesce(F.col("lastName"), F.lit("")),
            )
        ),
        F.transform(
            strong_akas,
            lambda a: process_name(
                F.coalesce(a["firstName"], F.lit("")),
                F.coalesce(a["lastName"], F.lit("")),
            ),
        ),
    )
    ids = F.coalesce(
        F.col("idList.id"),
        F.array().cast("array<struct<idType:string,idNumber:string>>"),
    )
    pob = F.transform(
        _nz(
            F.coalesce(
                F.col("placeOfBirthList.placeOfBirthItem.placeOfBirth"),
                _empty_sarr(),
            )
        ),
        # last comma-part (Fetcher.pm:303)
        lambda p: F.element_at(F.split(p, ","), -1),
    )
    raw = df.select(
        names.alias("names"),
        _nz(
            F.coalesce(
                F.col("dateOfBirthList.dateOfBirthItem.dateOfBirth"), _empty_sarr()
            )
        ).alias("date_of_birth"),
        pob.alias("place_of_birth"),
        _nz(
            F.coalesce(F.col("addressList.address.country"), _empty_sarr())
        ).alias("residence"),
        _nz(
            F.coalesce(F.col("naationalityList.nationality.country"), _empty_sarr())
        ).alias("nationality"),
        _nz(
            F.coalesce(F.col("citizenshipList.citizenship.country"), _empty_sarr())
        ).alias("citizen"),
        _nz(
            F.coalesce(F.col("addressList.address.postalCode"), _empty_sarr())
        ).alias("postal_code"),
        F.transform(
            F.filter(ids, lambda i: i["idType"].rlike("National ID")),
            lambda i: i["idNumber"],
        ).alias("national_id"),
        F.transform(
            F.filter(ids, lambda i: i["idType"] == "Passport"),
            lambda i: i["idNumber"],
        ).alias("passport_no"),
    )
    return updated, _finish(raw, source)


# ---------------------------------------------------------------- HMT ---

def parse_hmt_csv(
    spark: SparkSession, path: str, source: str = "HMT-Sanctions"
) -> tuple[int | None, DataFrame]:
    df = spark.read.option("header", "false").csv(path)
    cols = df.columns

    head = df.limit(2).collect()
    updated = None
    header_map: dict[str, int] = {}
    if len(head) >= 2:
        date_row = head[0]
        row = (
            spark.range(1)
            .select(date_to_epoch(F.lit((date_row[1] or "").strip())))
            .collect()
        )
        updated = row[0][0]
        header_map = {
            (v or "").strip(): i for i, v in enumerate(head[1]) if v is not None
        }

    def cell(label: str):
        i = header_map.get(label)
        if i is None or i >= len(cols):
            return None
        # trim + strip trailing parenthetical on every cell (Fetcher.pm:357)
        return F.trim(strip_trailing_parenthetical(F.trim(F.col(cols[i]))))

    gt = cell("Group Type")
    data = df.filter(gt == "Individual") if gt is not None else df.limit(0)

    name = process_name(
        *[
            F.coalesce(
                F.trim(strip_trailing_parenthetical(F.trim(F.col(cols[i])))),
                F.lit(""),
            )
            for i in range(6)
        ]
    )
    data = data.filter(F.trim(name) != "")

    def opt_arr(label: str):
        c = cell(label)
        return F.array(c) if c is not None else _empty_sarr()

    raw = data.select(
        F.filter(
            F.array(name, *(
                [cell("Name Non-Latin Script")]
                if "Name Non-Latin Script" in header_map
                else []
            )),
            lambda x: x.isNotNull() & (x != ""),
        ).alias("names"),
        opt_arr("DOB").alias("date_of_birth"),
        opt_arr("Country of Birth").alias("place_of_birth"),
        opt_arr("Country").alias("residence"),
        # nationality is an adjective in this feed; ignored (Fetcher.pm:367)
        _empty_sarr().alias("nationality"),
        F.lit(None).cast("array<string>").alias("citizen"),
        opt_arr("Post/Zip Code").alias("postal_code"),
        opt_arr("National Identification Number").alias("national_id"),
        (
            opt_arr("Passport Number")
            if "Passport Number" in header_map
            else _empty_sarr()
        ).alias("passport_no"),
    )
    return updated, _finish(raw, source)


# ----------------------------------------------------------------- EU ---

EU_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField(
            "subjectType",
            T.StructType([T.StructField("_code", _S, True)]),
            True,
        ),
        T.StructField(
            "nameAlias",
            _arr(("_wholeName", _S), ("_firstName", _S), ("_lastName", _S)),
            True,
        ),
        T.StructField(
            "birthdate",
            _arr(("_birthdate", _S), ("_year", _S), ("_countryIso2Code", _S)),
            True,
        ),
        T.StructField("citizenship", _arr(("_countryIso2Code", _S)), True),
        T.StructField(
            "address",
            _arr(("_countryIso2Code", _S), ("_zipCode", _S), ("_poBox", _S)),
            True,
        ),
        T.StructField(
            "identification",
            _arr(
                ("_countryIso2Code", _S),
                ("_identificationTypeCode", _S),
                ("_number", _S),
            ),
            True,
        ),
    ]
)


def parse_eu_xml(
    spark: SparkSession, path: str, source: str = "EU-Sanctions"
) -> tuple[int | None, DataFrame]:
    root = (
        spark.read.format("xml")
        .option("rowTag", "export")
        .load(path)
        .select(F.col("_generationDate").cast("string").alias("g"))
        .collect()
    )
    updated = None
    if root:
        date_part = (root[0]["g"] or "").split("T")[0]
        updated = (
            spark.range(1).select(date_to_epoch(F.lit(date_part))).collect()[0][0]
        )

    df = (
        spark.read.format("xml")
        .option("rowTag", "sanctionEntity")
        .schema(EU_ENTRY_SCHEMA)
        .load(path)
        .filter(F.col("subjectType._code") == "person")
    )
    aliases = F.coalesce(
        F.col("nameAlias"),
        F.array().cast(
            "array<struct<_wholeName:string,_firstName:string,_lastName:string>>"
        ),
    )
    # wholeName, else 'first last' — every alias counts, strong or not
    # (Fetcher.pm:411-416); ' ' (both empty) is dropped
    names = F.filter(
        F.transform(
            aliases,
            lambda a: F.when(
                a["_wholeName"].isNotNull() & (a["_wholeName"] != ""),
                a["_wholeName"],
            ).otherwise(
                F.concat_ws(
                    " ",
                    F.coalesce(a["_firstName"], F.lit("")),
                    F.coalesce(a["_lastName"], F.lit("")),
                )
            ),
        ),
        lambda n: n != " ",
    )
    bds = F.coalesce(
        F.col("birthdate"),
        F.array().cast(
            "array<struct<_birthdate:string,_year:string,_countryIso2Code:string>>"
        ),
    )
    dobs = F.filter(
        F.transform(
            bds,
            lambda b: F.when(
                b["_birthdate"].isNotNull() & (b["_birthdate"] != ""),
                b["_birthdate"],
            ).otherwise(b["_year"]),
        ),
        lambda d: d.isNotNull() & (d != ""),
    )
    idents = F.coalesce(
        F.col("identification"),
        F.array().cast(
            "array<struct<_countryIso2Code:string,_identificationTypeCode:string,"
            "_number:string>>"
        ),
    )
    addr = F.coalesce(
        F.col("address"),
        F.array().cast(
            "array<struct<_countryIso2Code:string,_zipCode:string,_poBox:string>>"
        ),
    )
    raw = df.select(
        names.alias("names"),
        dobs.alias("date_of_birth"),
        _nz(F.transform(bds, lambda b: b["_countryIso2Code"])).alias(
            "place_of_birth"
        ),
        _nz(
            F.transform(
                F.coalesce(
                    F.col("citizenship"),
                    F.array().cast("array<struct<_countryIso2Code:string>>"),
                ),
                lambda c: c["_countryIso2Code"],
            )
        ).alias("citizen"),
        _nz(F.transform(addr, lambda a: a["_countryIso2Code"])).alias("residence"),
        _nz(
            # Perl falsiness (Fetcher.pm `-zipCode || -poBox`): an EMPTY
            # zipCode also falls back to poBox — coalesce alone would
            # keep the '' and lose the poBox
            F.transform(
                addr,
                lambda a: F.when(
                    a["_zipCode"].isNotNull() & (a["_zipCode"] != ""),
                    a["_zipCode"],
                ).otherwise(a["_poBox"]),
            )
        ).alias("postal_code"),
        _nz(F.transform(idents, lambda i: i["_countryIso2Code"])).alias(
            "nationality"
        ),
        F.transform(
            F.filter(
                idents, lambda i: i["_identificationTypeCode"] == "id"
            ),
            lambda i: i["_number"],
        ).alias("national_id"),
        F.transform(
            F.filter(
                idents, lambda i: i["_identificationTypeCode"] == "passport"
            ),
            lambda i: i["_number"],
        ).alias("passport_no"),
    )
    return updated, _finish(raw, source)


# --------------------------------------------------------------- UNSC ---

UNSC_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("FIRST_NAME", _S, True),
        T.StructField("SECOND_NAME", _S, True),
        T.StructField("THIRD_NAME", _S, True),
        T.StructField("FOURTH_NAME", _S, True),
        T.StructField("NAME_ORIGINAL_SCRIPT", _S, True),
        T.StructField("INDIVIDUAL_ALIAS", _arr(("ALIAS_NAME", _S)), True),
        T.StructField(
            "INDIVIDUAL_DATE_OF_BIRTH",
            _arr(
                ("TYPE_OF_DATE", _S), ("DATE", _S), ("YEAR", _S),
                ("FROM_YEAR", _S), ("TO_YEAR", _S),
            ),
            True,
        ),
        T.StructField(
            "INDIVIDUAL_PLACE_OF_BIRTH",
            _arr(("CITY", _S), ("STATE_PROVINCE", _S), ("COUNTRY", _S)),
            True,
        ),
        T.StructField(
            "INDIVIDUAL_ADDRESS", _arr(("COUNTRY", _S), ("ZIP_CODE", _S)), True
        ),
        T.StructField(
            "NATIONALITY", T.StructType([T.StructField("VALUE", _S, True)]), True
        ),
        T.StructField(
            "INDIVIDUAL_DOCUMENT",
            _arr(("TYPE_OF_DOCUMENT", _S), ("NUMBER", _S)),
            True,
        ),
    ]
)


def parse_unsc_xml(
    spark: SparkSession, path: str, source: str = "UNSC-Sanctions"
) -> tuple[int | None, DataFrame]:
    root = (
        spark.read.format("xml")
        .option("rowTag", "CONSOLIDATED_LIST")
        .load(path)
        .select(F.col("_dateGenerated").cast("string").alias("g"))
        .collect()
    )
    updated = None
    if root and root[0]["g"]:
        updated = (
            spark.range(1)
            .select(date_to_epoch(F.lit(root[0]["g"])))
            .collect()[0][0]
        )

    df = (
        spark.read.format("xml")
        .option("rowTag", "INDIVIDUAL")
        .schema(UNSC_ENTRY_SCHEMA)
        .load(path)
    )
    aliases = F.coalesce(
        F.col("INDIVIDUAL_ALIAS.ALIAS_NAME"), _empty_sarr()
    )
    # the four name parts, original script, and each alias are all
    # separate names (Fetcher.pm:478-497)
    names = F.concat(
        F.array(
            F.coalesce(F.col("FIRST_NAME"), F.lit("")),
            F.coalesce(F.col("SECOND_NAME"), F.lit("")),
            F.coalesce(F.col("THIRD_NAME"), F.lit("")),
            F.coalesce(F.col("FOURTH_NAME"), F.lit("")),
            F.coalesce(F.col("NAME_ORIGINAL_SCRIPT"), F.lit("")),
        ),
        aliases,
    )
    dob0 = F.element_at(F.col("INDIVIDUAL_DATE_OF_BIRTH"), 1)
    dobs = (
        F.when(
            dob0["TYPE_OF_DATE"] == "BETWEEN",
            F.array(
                F.coalesce(dob0["FROM_YEAR"], F.lit("")),
                F.coalesce(dob0["TO_YEAR"], F.lit("")),
            ),
        )
        .when(dob0["DATE"].isNotNull() & (dob0["DATE"] != ""), F.array(dob0["DATE"]))
        .when(dob0["YEAR"].isNotNull() & (dob0["YEAR"] != ""), F.array(dob0["YEAR"]))
        .otherwise(_empty_sarr())
    )
    pob0 = F.element_at(F.col("INDIVIDUAL_PLACE_OF_BIRTH"), 1)
    docs = F.coalesce(
        F.col("INDIVIDUAL_DOCUMENT"),
        F.array().cast("array<struct<TYPE_OF_DOCUMENT:string,NUMBER:string>>"),
    )
    raw = df.select(
        names.alias("names"),
        dobs.alias("date_of_birth"),
        F.array(
            F.coalesce(pob0["CITY"], F.lit("")),
            F.coalesce(pob0["STATE_PROVINCE"], F.lit("")),
            F.coalesce(pob0["COUNTRY"], F.lit("")),
        ).alias("place_of_birth"),
        _nz(
            F.coalesce(F.col("INDIVIDUAL_ADDRESS.COUNTRY"), _empty_sarr())
        ).alias("residence"),
        F.array(F.coalesce(F.col("NATIONALITY.VALUE"), F.lit(""))).alias(
            "nationality"
        ),
        F.array(F.coalesce(F.col("NATIONALITY.VALUE"), F.lit(""))).alias(
            "citizen"  # no separate citizenship field (Fetcher.pm:545)
        ),
        _nz(
            F.coalesce(F.col("INDIVIDUAL_ADDRESS.ZIP_CODE"), _empty_sarr())
        ).alias("postal_code"),
        F.transform(
            F.filter(
                docs,
                lambda d: d["TYPE_OF_DOCUMENT"] == "National Identification Number",
            ),
            lambda d: d["NUMBER"],
        ).alias("national_id"),
        F.transform(
            F.filter(docs, lambda d: d["TYPE_OF_DOCUMENT"] == "Passport"),
            lambda d: d["NUMBER"],
        ).alias("passport_no"),
    )
    return updated, _finish(raw, source)


# --------------------------------------------------------------- MOHA ---

MOHA_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField(
            "field",
            _arr(("_name", _S), ("_VALUE", _S)),
            True,
        )
    ]
)


def parse_moha_xml(
    spark: SparkSession, path: str, source: str = "MOHA-Sanctions"
) -> tuple[int | None, DataFrame]:
    """MOHA dispatcher (Fetcher.pm:561-579): the feed historically ships
    in two shapes — the v2 ``xmlResponse`` format and the legacy
    ``TaggedPDF-doc`` (Acrobat save-as-XML) format. The reference
    dispatches on which root key the parsed hash contains; sniffing the
    raw document head for the root element is the same test without a
    full driver-side parse."""
    local = path[7:] if path.startswith("file://") else path
    with open(local, "rb") as fh:
        head = fh.read(262144).decode("utf-8", "replace")
    if "<xmlResponse" in head:
        return parse_moha_xml_v2(spark, path, source=source)
    return parse_moha_xml_legacy(spark, path, source=source, _head=head)


def parse_moha_xml_v2(
    spark: SparkSession, path: str, source: str = "MOHA-Sanctions"
) -> tuple[int | None, DataFrame]:
    """MOHA v2 ``xmlResponse`` format (Fetcher.pm:587-669): each entry is
    a list of labelled fields; individuals carry '(6) Date of Birth';
    DOBs are every d.m.yyyy match; passports split on '/'.
    ``updated`` is fetch time in the reference (no publish date in the
    feed) — we return None and let the caller stamp it."""
    df = (
        spark.read.format("xml")
        .option("rowTag", "entry")
        .schema(MOHA_ENTRY_SCHEMA)
        .load(path)
    )
    fields = F.coalesce(
        F.col("field"), F.array().cast("array<struct<_name:string,_VALUE:string>>")
    )

    def fval(label: str):
        # field-name whitespace is normalized before matching (Fetcher.pm:608)
        hit = F.filter(
            fields,
            lambda f: F.regexp_replace(
                F.coalesce(f["_name"], F.lit("")), r"\s+", " "
            )
            == label,
        )
        v = F.element_at(hit, 1)["_VALUE"]
        return F.trim(F.coalesce(v, F.lit("")))

    name = fval("(3) Name")
    dob_raw = fval("(6) Date of Birth")
    is_individual = F.exists(
        fields,
        lambda f: F.regexp_replace(F.coalesce(f["_name"], F.lit("")), r"\s+", " ")
        == "(6) Date of Birth",
    )

    def dashless(c):
        return F.when((c != "") & (c != "-"), c)

    df = df.filter((name != "") & (name != "-"))
    ind = df.filter(is_individual)
    grp = df.filter(~is_individual)

    ind_raw = ind.select(
        _nz(
            F.array(name, F.coalesce(dashless(fval("(8) Other Names")), F.lit("")))
        ).alias("names"),
        F.when(
            dashless(dob_raw).isNotNull(),
            F.regexp_extract_all(dob_raw, F.lit(r"(\d{1,2}\.\d{1,2}\.\d{4})"), 1),
        )
        .otherwise(_empty_sarr())
        .alias("date_of_birth"),
        F.array(fval("(7) Place of Birth")).alias("place_of_birth"),
        F.lit(None).cast("array<string>").alias("residence"),
        F.array(fval("(9) Nationality")).alias("nationality"),
        F.lit(None).cast("array<string>").alias("citizen"),
        F.lit(None).cast("array<string>").alias("postal_code"),
        _nz(
            F.array(
                F.coalesce(
                    dashless(fval("(11) Identification Card Number")), F.lit("")
                )
            )
        ).alias("national_id"),
        F.when(
            dashless(fval("(10) Passport Number")).isNotNull(),
            F.transform(
                F.split(fval("(10) Passport Number"), "/"), lambda p: F.trim(p)
            ),
        )
        .otherwise(_empty_sarr())
        .alias("passport_no"),
    )
    grp_raw = grp.select(
        _nz(
            F.array(
                name,
                F.coalesce(dashless(fval("(4) Alias")), F.lit("")),
                F.coalesce(dashless(fval("(5) Other Name")), F.lit("")),
            )
        ).alias("names"),
        _empty_sarr().alias("date_of_birth"),
        F.lit(None).cast("array<string>").alias("place_of_birth"),
        F.lit(None).cast("array<string>").alias("residence"),
        F.lit(None).cast("array<string>").alias("nationality"),
        F.lit(None).cast("array<string>").alias("citizen"),
        F.lit(None).cast("array<string>").alias("postal_code"),
        F.lit(None).cast("array<string>").alias("national_id"),
        F.lit(None).cast("array<string>").alias("passport_no"),
    )
    return None, _finish(ind_raw.unionByName(grp_raw), source)


# legacy TaggedPDF-doc row: a TR holds TH cells then TD cells, each cell
# one-or-more <P> text blocks (spark-xml folds single-or-array into the
# declared array type, mirroring the reference's ref-eq-ARRAY juggling)
_MOHA_CELL = T.ArrayType(
    T.StructType([T.StructField("P", T.ArrayType(_S), True)])
)
MOHA_LEGACY_TBODY_SCHEMA = T.StructType(
    [
        T.StructField(
            "TR",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("TH", _MOHA_CELL, True),
                        T.StructField("TD", _MOHA_CELL, True),
                    ]
                )
            ),
            True,
        )
    ]
)


def parse_moha_xml_legacy(
    spark: SparkSession,
    path: str,
    source: str = "MOHA-Sanctions",
    _head: str | None = None,
) -> tuple[int | None, DataFrame]:
    """MOHA legacy ``TaggedPDF-doc`` format (Fetcher.pm:677-806): a PDF
    table saved as tagged XML. Publish date comes from
    ``<xmp:CreateDate>`` (the reference's three lookups all resolve the
    same element; parse failure is fatal for the source,
    Fetcher.pm:700-701). Rows are the ``<TR>`` children of each table's
    ``<TBody>`` (``rowTag TBody`` — header rows living in ``<THead>``
    never enter the scan, same as the reference's ``{'TBody'}{'TR'}``
    access). Per row: cells are TH entries then TD entries
    (Fetcher.pm:744-765); a FIRST row whose first cell starts '(1)' or
    'No.' is a header and skipped (Fetcher.pm:715-740); rows with <11
    cells are skipped; fields by position — name=2 (multi-<P> joined),
    dob=5 (each <P> its own DOB), pob=6, other-names=7 (each <P> an
    alias), nationality=8, passport=9 (NOT '/'-split, unlike v2),
    id=10."""
    import re

    if _head is None:
        local = path[7:] if path.startswith("file://") else path
        with open(local, "rb") as fh:
            _head = fh.read(262144).decode("utf-8", "replace")
    m = re.search(r"<xmp:CreateDate>([^<]+)</xmp:CreateDate>", _head)
    updated = None
    if m:
        updated = (
            spark.range(1)
            .select(date_to_epoch(F.lit(m.group(1))))
            .collect()[0][0]
        )
    if not updated:
        raise ValueError("Invalid or missing creation date in XML")

    tbodies = (
        spark.read.format("xml")
        .option("rowTag", "TBody")
        .schema(MOHA_LEGACY_TBODY_SCHEMA)
        .load(path)
    )
    rows = tbodies.select(
        F.posexplode(F.coalesce(F.col("TR"), F.array())).alias("pos", "row")
    )
    empty_cells = F.array().cast(_MOHA_CELL)
    cells = F.concat(
        F.coalesce(F.col("row.TH"), empty_cells),
        F.coalesce(F.col("row.TD"), empty_cells),
    )
    rows = rows.select("pos", cells.alias("cells")).filter(
        F.size("cells") >= 11  # Fetcher.pm:767
    )

    def ptexts(i: int):
        """cell i's <P> texts, trimmed, empties dropped."""
        return _nz(
            F.transform(
                F.coalesce(
                    F.element_at(F.col("cells"), i + 1)["P"],
                    F.array().cast("array<string>"),
                ),
                lambda p: F.trim(F.coalesce(p, F.lit(""))),
            )
        )

    def ptext(i: int):
        """cell i as one string (multi-<P> joined, Fetcher.pm:784)."""
        return F.array_join(ptexts(i), " ")

    first_cell = ptext(0)
    # header row: FIRST row of its table only (Fetcher.pm:715-740)
    rows = rows.filter(
        ~((F.col("pos") == 0) & first_cell.rlike(r"^\(1\)|^No\."))
    )

    raw = rows.select(
        F.concat(F.array(ptext(2)), ptexts(7)).alias("names"),
        ptexts(5).alias("date_of_birth"),
        F.array(ptext(6)).alias("place_of_birth"),
        F.lit(None).cast("array<string>").alias("residence"),
        F.array(ptext(8)).alias("nationality"),
        F.lit(None).cast("array<string>").alias("citizen"),
        F.lit(None).cast("array<string>").alias("postal_code"),
        _nz(F.array(ptext(10))).alias("national_id"),
        _nz(F.array(ptext(9))).alias("passport_no"),
    )
    return updated, _finish(raw, source)


# ---------------------------------------------------------------- zip ---

def parse_ofac_xml_zip(
    spark: SparkSession, path: str, source: str = "OFAC-SDN"
) -> tuple[int | None, DataFrame]:
    """S3 (Fetcher.pm:117-122): the OFAC SDN feed arrives zipped ("7mb+
    file", Fetcher.pm:75); decompress driver-side to a temp file and
    delegate to the XML parser. (At cluster scale the decompressed file
    would land on shared storage first; the parse itself is
    distributed either way.)"""
    import tempfile
    import zipfile

    with zipfile.ZipFile(path) as zf:
        inner = zf.namelist()[0]
        with tempfile.NamedTemporaryFile(
            suffix=".xml", delete=False
        ) as out:
            out.write(zf.read(inner))
            tmp_path = out.name
    return parse_ofac_xml(spark, tmp_path, source=source)


# ----------------------------------------------------------- registry ---

# source-name → parser (the Fetcher.pm config table, Fetcher.pm:60-131);
# each callable is (spark, path) → (updated_epoch, entries_df). Zipped
# OFAC feeds dispatch on the .zip extension like the reference's
# is_zipped flag.
def _ofac(src):
    def run(spark, path):
        fn = parse_ofac_xml_zip if path.endswith(".zip") else parse_ofac_xml
        return fn(spark, path, source=src)
    return run


PARSER_REGISTRY = {
    "OFAC-SDN": _ofac("OFAC-SDN"),
    "OFAC-Consolidated": _ofac("OFAC-Consolidated"),
    "HMT-Sanctions": lambda spark, path: parse_hmt_csv(spark, path),
    "EU-Sanctions": lambda spark, path: parse_eu_xml(spark, path),
    "UNSC-Sanctions": lambda spark, path: parse_unsc_xml(spark, path),
    "MOHA-Sanctions": lambda spark, path: parse_moha_xml(spark, path),
}


def fetch_sources(
    spark: SparkSession, feeds: dict[str, str],
    retries: int = 3, transport=None,
) -> tuple[DataFrame | None, dict[str, int], dict[str, str]]:
    """Run the registered parser for each (source → path/url) feed with
    per-source error isolation (Fetcher.pm:830-859: one bad feed never
    aborts the run). Returns (union_of_entries, updated_by_source,
    errors_by_source) — exactly the update_data() inputs.

    Feed values may be local paths, ``file://`` URLs, or ``http(s)://``
    URLs — remote feeds go through the retry/redirect/token-scrub
    fetch path (sources/fetcher.py, Fetcher.pm:889-918 semantics);
    ``transport``/``retries`` pass through for testability. Error
    messages never carry an unscrubbed URL."""
    from .fetcher import clean_url, fetch_to_file

    dfs: list[DataFrame] = []
    updated: dict[str, int] = {}
    errors: dict[str, str] = {}
    for source, path in feeds.items():
        parser = PARSER_REGISTRY.get(source)
        if parser is None:
            errors[source] = f"no parser registered for {source!r}"
            continue
        try:
            if path.startswith(("http://", "https://")):
                path = fetch_to_file(path, retries=retries,
                                     transport=transport)
            elif path.startswith("file://"):
                path = path[len("file://"):]
            upd, df = parser(spark, path)
            # force the parse eagerly so malformed feeds fail HERE,
            # inside this source's try, not downstream in the merge
            n = df.count()
            dfs.append(df)
            updated[source] = int(upd) if upd is not None else 0
            _ = n
        except Exception as e:  # noqa: BLE001 - per-source isolation
            errors[source] = f"{type(e).__name__}: {e}"
    union = None
    for df in dfs:
        union = df if union is None else union.unionByName(df)
    return union, updated, errors
