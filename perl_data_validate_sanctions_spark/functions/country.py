"""Country name/code → lowercase ISO-3166 alpha-2, as a Column expression.

Reference: ``get_country_code``
(/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:145-153):
``lc(code2country($value) ? $value : country2code($value) // '')`` —
i.e. if the (case-insensitive) value is already a known alpha-2 code,
lowercase it; else translate a country name to its code; unknown → ''.

The lookup table is assembled from public ISO-3166 knowledge (the same
data Locale::Country wraps), plus common aliases. It is evaluated as a
single Catalyst ``MAP`` literal → ``element_at`` so it stays inside
codegen, works element-wise inside ``transform`` lambdas over arrays,
and never joins/shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ISO-3166 alpha-2 code -> canonical English short name (public data).
ISO_3166: dict[str, str] = {
    "ad": "Andorra", "ae": "United Arab Emirates", "af": "Afghanistan",
    "ag": "Antigua and Barbuda", "ai": "Anguilla", "al": "Albania",
    "am": "Armenia", "ao": "Angola", "aq": "Antarctica", "ar": "Argentina",
    "as": "American Samoa", "at": "Austria", "au": "Australia",
    "aw": "Aruba", "ax": "Aland Islands", "az": "Azerbaijan",
    "ba": "Bosnia and Herzegovina", "bb": "Barbados", "bd": "Bangladesh",
    "be": "Belgium", "bf": "Burkina Faso", "bg": "Bulgaria", "bh": "Bahrain",
    "bi": "Burundi", "bj": "Benin", "bl": "Saint Barthelemy", "bm": "Bermuda",
    "bn": "Brunei Darussalam", "bo": "Bolivia", "bq": "Bonaire",
    "br": "Brazil", "bs": "Bahamas", "bt": "Bhutan", "bv": "Bouvet Island",
    "bw": "Botswana", "by": "Belarus", "bz": "Belize", "ca": "Canada",
    "cc": "Cocos Islands", "cd": "Congo, The Democratic Republic of the",
    "cf": "Central African Republic", "cg": "Congo", "ch": "Switzerland",
    "ci": "Cote d'Ivoire", "ck": "Cook Islands", "cl": "Chile",
    "cm": "Cameroon", "cn": "China", "co": "Colombia", "cr": "Costa Rica",
    "cu": "Cuba", "cv": "Cabo Verde", "cw": "Curacao", "cx": "Christmas Island",
    "cy": "Cyprus", "cz": "Czechia", "de": "Germany", "dj": "Djibouti",
    "dk": "Denmark", "dm": "Dominica", "do": "Dominican Republic",
    "dz": "Algeria", "ec": "Ecuador", "ee": "Estonia", "eg": "Egypt",
    "eh": "Western Sahara", "er": "Eritrea", "es": "Spain", "et": "Ethiopia",
    "fi": "Finland", "fj": "Fiji", "fk": "Falkland Islands",
    "fm": "Micronesia", "fo": "Faroe Islands", "fr": "France", "ga": "Gabon",
    "gb": "United Kingdom", "gd": "Grenada", "ge": "Georgia",
    "gf": "French Guiana", "gg": "Guernsey", "gh": "Ghana", "gi": "Gibraltar",
    "gl": "Greenland", "gm": "Gambia", "gn": "Guinea", "gp": "Guadeloupe",
    "gq": "Equatorial Guinea", "gr": "Greece",
    "gs": "South Georgia and the South Sandwich Islands", "gt": "Guatemala",
    "gu": "Guam", "gw": "Guinea-Bissau", "gy": "Guyana", "hk": "Hong Kong",
    "hm": "Heard Island and McDonald Islands", "hn": "Honduras",
    "hr": "Croatia", "ht": "Haiti", "hu": "Hungary", "id": "Indonesia",
    "ie": "Ireland", "il": "Israel", "im": "Isle of Man", "in": "India",
    "io": "British Indian Ocean Territory", "iq": "Iraq",
    "ir": "Iran, Islamic Republic of", "is": "Iceland", "it": "Italy",
    "je": "Jersey", "jm": "Jamaica", "jo": "Jordan", "jp": "Japan",
    "ke": "Kenya", "kg": "Kyrgyzstan", "kh": "Cambodia", "ki": "Kiribati",
    "km": "Comoros", "kn": "Saint Kitts and Nevis",
    "kp": "Korea, Democratic People's Republic of", "kr": "Korea, Republic of",
    "kw": "Kuwait", "ky": "Cayman Islands", "kz": "Kazakhstan",
    "la": "Lao People's Democratic Republic", "lb": "Lebanon",
    "lc": "Saint Lucia", "li": "Liechtenstein", "lk": "Sri Lanka",
    "lr": "Liberia", "ls": "Lesotho", "lt": "Lithuania", "lu": "Luxembourg",
    "lv": "Latvia", "ly": "Libya", "ma": "Morocco", "mc": "Monaco",
    "md": "Moldova, Republic of", "me": "Montenegro", "mf": "Saint Martin",
    "mg": "Madagascar", "mh": "Marshall Islands", "mk": "North Macedonia",
    "ml": "Mali", "mm": "Myanmar", "mn": "Mongolia", "mo": "Macao",
    "mp": "Northern Mariana Islands", "mq": "Martinique", "mr": "Mauritania",
    "ms": "Montserrat", "mt": "Malta", "mu": "Mauritius", "mv": "Maldives",
    "mw": "Malawi", "mx": "Mexico", "my": "Malaysia", "mz": "Mozambique",
    "na": "Namibia", "nc": "New Caledonia", "ne": "Niger",
    "nf": "Norfolk Island", "ng": "Nigeria", "ni": "Nicaragua",
    "nl": "Netherlands", "no": "Norway", "np": "Nepal", "nr": "Nauru",
    "nu": "Niue", "nz": "New Zealand", "om": "Oman", "pa": "Panama",
    "pe": "Peru", "pf": "French Polynesia", "pg": "Papua New Guinea",
    "ph": "Philippines", "pk": "Pakistan", "pl": "Poland",
    "pm": "Saint Pierre and Miquelon", "pn": "Pitcairn", "pr": "Puerto Rico",
    "ps": "Palestine, State of", "pt": "Portugal", "pw": "Palau",
    "py": "Paraguay", "qa": "Qatar", "re": "Reunion", "ro": "Romania",
    "rs": "Serbia", "ru": "Russian Federation", "rw": "Rwanda",
    "sa": "Saudi Arabia", "sb": "Solomon Islands", "sc": "Seychelles",
    "sd": "Sudan", "se": "Sweden", "sg": "Singapore", "sh": "Saint Helena",
    "si": "Slovenia", "sj": "Svalbard and Jan Mayen", "sk": "Slovakia",
    "sl": "Sierra Leone", "sm": "San Marino", "sn": "Senegal",
    "so": "Somalia", "sr": "Suriname", "ss": "South Sudan",
    "st": "Sao Tome and Principe", "sv": "El Salvador", "sx": "Sint Maarten",
    "sy": "Syrian Arab Republic", "sz": "Eswatini",
    "tc": "Turks and Caicos Islands", "td": "Chad",
    "tf": "French Southern Territories", "tg": "Togo", "th": "Thailand",
    "tj": "Tajikistan", "tk": "Tokelau", "tl": "Timor-Leste",
    "tm": "Turkmenistan", "tn": "Tunisia", "to": "Tonga", "tr": "Turkey",
    "tt": "Trinidad and Tobago", "tv": "Tuvalu", "tw": "Taiwan",
    "tz": "Tanzania, United Republic of", "ua": "Ukraine", "ug": "Uganda",
    "um": "United States Minor Outlying Islands", "us": "United States",
    "uy": "Uruguay", "uz": "Uzbekistan", "va": "Holy See",
    "vc": "Saint Vincent and the Grenadines", "ve": "Venezuela",
    "vg": "Virgin Islands, British", "vi": "Virgin Islands, U.S.",
    "vn": "Viet Nam", "vu": "Vanuatu", "wf": "Wallis and Futuna",
    "ws": "Samoa", "ye": "Yemen", "yt": "Mayotte", "za": "South Africa",
    "zm": "Zambia", "zw": "Zimbabwe",
}

# common aliases Locale::Country also resolves (public knowledge)
ALIASES: dict[str, str] = {
    "russia": "ru", "iran": "ir", "north korea": "kp", "south korea": "kr",
    "korea": "kr", "syria": "sy", "vietnam": "vn", "laos": "la",
    "usa": "us", "united states of america": "us", "america": "us",
    "uk": "gb", "great britain": "gb", "britain": "gb", "england": "gb",
    "czech republic": "cz", "macedonia": "mk", "moldova": "md",
    "tanzania": "tz", "bolivia, plurinational state of": "bo",
    "venezuela, bolivarian republic of": "ve", "brunei": "bn",
    "cape verde": "cv", "ivory coast": "ci", "burma": "mm",
    "palestine": "ps", "vatican": "va", "vatican city": "va",
    "democratic republic of the congo": "cd", "dr congo": "cd",
    "republic of the congo": "cg", "east timor": "tl",
    "swaziland": "sz", "turkiye": "tr", "hong kong sar": "hk",
    "macau": "mo", "the netherlands": "nl", "holland": "nl",
    "united arab emirates (uae)": "ae", "uae": "ae",
    "kyrgyz republic": "kg", "slovak republic": "sk",
    "iran, islamic republic": "ir", "islamic republic of iran": "ir",
    "democratic people's republic of korea": "kp", "dprk": "kp",
    "korea (the democratic people's republic of)": "kp",
    "russian federation": "ru", "republic of korea": "kr",
    "people's republic of china": "cn", "prc": "cn",
}


def _lookup_table() -> dict[str, str]:
    table: dict[str, str] = {}
    for code, name in ISO_3166.items():
        table[code] = code               # already-a-code passthrough
        table[name.lower()] = code       # canonical name
        # names like "Iran, Islamic Republic of" also resolve from the
        # leading simple form ("iran")
        simple = name.split(",")[0].lower()
        table.setdefault(simple, code)
    for alias, code in ALIASES.items():
        table[alias] = code
    return table


_TABLE = _lookup_table()

# One str_to_map over a single string literal instead of a 700-node
# create_map tree: Catalyst constant-folds it to one map Literal during
# optimization, so analysis/codegen cost is O(1) per query instead of
# O(table) (measured: 165s -> sub-second for the first lookup query).
_PAIR_SEP = "\x01"
_KV_SEP = "\x02"


def _map_expr() -> Column:
    blob = _PAIR_SEP.join(f"{k}{_KV_SEP}{v}" for k, v in sorted(_TABLE.items()))
    return F.str_to_map(F.lit(blob), F.lit(_PAIR_SEP), F.lit(_KV_SEP))


def country_code(col: Column | str) -> Column:
    """name-or-code → lowercase ISO2, '' when unknown (Fetcher.pm:149-153)."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.lower(F.trim(c))
    return F.coalesce(F.element_at(_map_expr(), key), F.lit(""))
