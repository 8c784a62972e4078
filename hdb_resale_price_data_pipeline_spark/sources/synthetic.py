"""Scaled synthetic RAW inputs for benchmarking the full pipelines.

The test fixtures (tests/fixtures.py) are a handful of adversarial
rows — right for golden tests, useless for throughput. These writers
generate arbitrarily many raw rows in the reference's scraper/API
output shapes (FIXTURES.md §1–3): multi-vintage historical CSVs
(second vintage carries the extra ``remaining_lease`` column), and
propnex/srx listing JSON with 'None' missing-value strings, emoji
descriptions and deliberate cross-source (location, price) duplicates
so merge_dedup does real survivor work. Deterministic in ``n``: row i
is a pure function of i.
"""

from __future__ import annotations

import json
import os

# Towns must exist in seeds.TOWN_DISTRICT_ROWS; (town, district) pairs
# here are consistent with those seed rows.
_TOWNS: list[tuple[str, int]] = [
    ("BEDOK", 16),
    ("TAMPINES", 18),
    ("ANG MO KIO", 20),
    ("YISHUN", 27),
    ("CLEMENTI", 5),
    ("HOUGANG", 19),
    ("QUEENSTOWN", 3),
    ("SERANGOON", 12),
]
_FLAT_TYPES = ["3 ROOM", "4 ROOM", "5 ROOM", "EXECUTIVE", "MULTI GENERATION"]
_MODELS = ["New Generation", "Improved", "Model A", "Apartment", "Multi Generation"]
_STOREYS = ["01 TO 03", "04 TO 06", "07 TO 09", "10 TO 12", "13 TO 15"]
_FURNISH = ["Partially Furnished", "Fully Furnished", "Unfurnished", "None"]


def write_historical_csvs(out_dir: str, n_rows: int, vintages: int = 4) -> str:
    """``vintages`` CSV files totalling ``n_rows``; later vintages carry
    the extra ``remaining_lease`` column (the multi-vintage projection
    conform the reference handles file-by-file)."""
    d = os.path.join(out_dir, "historical_csv")
    os.makedirs(d, exist_ok=True)
    per = max(n_rows // vintages, 1)
    base_cols = (
        "month,town,flat_type,block,street_name,storey_range,floor_area_sqm,"
        "flat_model,lease_commence_date,resale_price"
    )
    for v in range(vintages):
        extra = v >= vintages // 2
        with open(os.path.join(d, f"resale_{2015 + v}.csv"), "w") as f:
            f.write(base_cols + (",remaining_lease\n" if extra else "\n"))
            for j in range(per):
                i = v * per + j
                town, _ = _TOWNS[i % len(_TOWNS)]
                row = [
                    f"{2015 + v}-{i % 12 + 1:02d}",
                    town,
                    _FLAT_TYPES[i % len(_FLAT_TYPES)],
                    str(100 + i % 800),
                    f"{town} STREET {i % 90 + 1}",
                    _STOREYS[i % len(_STOREYS)],
                    str(60 + i % 110),
                    _MODELS[i % len(_MODELS)],
                    str(1970 + i % 45),
                    str(250_000 + (i * 7919) % 700_000),
                ]
                if extra:
                    row.append(f"{50 + i % 45} years")
                f.write(",".join(row) + "\n")
    return d


def _propnex_row(i: int, town: str, district: int, price: int) -> dict:
    none_every = 11  # deterministic sprinkle of 'None' strings
    return {
        "url": f"https://www.propnex.com/listing/{i}",
        "location": f"Blk {100 + i % 800} {town.title()} Street {i % 90 + 1}",
        "price": f"${price:,}",
        "price_psf": "None" if i % none_every == 0 else f"${400 + i % 300} psf",
        "street_town_district": f"{town.title()} Street {i % 90 + 1}\n{town.title()} (D{district})",
        "num_bedroom": "None" if i % none_every == 1 else str(2 + i % 4),
        "num_bathroom": str(1 + i % 3),
        "floor_area_sqft": f"{800 + i % 900:,} sqft ({int((800 + i % 900) / 10.764)} sqm)",
        "agent_name": f"Agent {i % 500}",
        "agent_id": f"#R{i % 100000:06d}A",
        "agent_email": f"agent{i % 500}@PROPNEX.com",
        "agent_phone_num": f"+65 9{i % 9000000 + 1000000}",
        "listing_type": "SALE",
        "property_group": "HDB",
        "property_type": f"HDB {2 + i % 4} Rooms",
        "district": f"D{district}",
        "total_floor_area": str(800 + i % 900),
        "top": str(1975 + i % 40),
        "furnishing": _FURNISH[i % len(_FURNISH)],
        "tenure": "99-year Leasehold",
        "floor": ["High Floor", "Mid Floor", "Low Floor"][i % 3],
        "post_code": f"{460000 + i % 40000}",
        "street_name": f"{town} STREET {i % 90 + 1}",
        "description": f"Listing {i} 🏠 near MRT" if i % 5 else "None",
        "facilities": "Lift, Playground, Carpark",
    }


def _srx_row(i: int, town: str, district: int, price: int) -> dict:
    sqft = 800 + i % 900
    return {
        "url": f"https://www.srx.com.sg/listings/{i}",
        "location": f"{100 + i % 800} {town.title()} Street {i % 90 + 1}",
        "floor_size_psf": f"{sqft:,} sqft / ${price // max(sqft, 1)} psf",
        "price": f"${price:,}",
        "num_bedroom": str(2 + i % 4),
        "num_bathroom": str(1 + i % 3),
        "description": f"Listing {i} 🎉" if i % 7 else "None",
        "agent_name": f"Agent {i % 500}",
        "agent_id": f"CEA: R{i % 100000:06d}A / L3008022J",
        "agent_phone_num": f"tel:9{i % 9000000 + 1000000}",
        "address": f"{100 + i % 800} {town.title()} Street {i % 90 + 1} ({460000 + i % 40000})",
        "property_name": f"{town} STREET {i % 90 + 1}",
        "property_type": f"HDB {2 + i % 4} Rooms",
        "model": _MODELS[i % len(_MODELS)],
        "bedrooms": ["3+1", "2", "3", "Studio"][i % 4],
        "bathrooms": str(1 + i % 3),
        "furnish": _FURNISH[i % len(_FURNISH)],
        "floor_level": ["High", "Mid", "Low"][i % 3],
        "tenure": "99 years",
        "developer": "HDB",
        "built_year": str(1975 + i % 40),
        "hdb_town": town.title(),
        "asking": f"${price:,}",
        "size": f"{int(sqft / 10.764)} sqm",
        "psf": f"${price // max(sqft, 1)} psf",
        "tenancy_status": "Vacant",
        "date_listed": f"2024-{i % 12 + 1:02d}-{i % 28 + 1:02d}",
        "facilities": "Lift, Playground",
        "train_stations": f"{town.title()} MRT",
        "schools": f"{town.title()} Primary",
        "shopping_mall/markets": f"{town.title()} Mall",
    }


def write_listing_jsons(out_dir: str, n_rows: int) -> tuple[str, str]:
    """propnex + srx listing JSON, ``n_rows`` each; every 10th srx row
    duplicates a propnex row's (location, price) so the merge's
    least-null survivor dedup has real collisions."""
    os.makedirs(out_dir, exist_ok=True)
    propnex, srx = [], []
    for i in range(n_rows):
        town, district = _TOWNS[i % len(_TOWNS)]
        price = 300_000 + (i * 104_729) % 900_000
        propnex.append(_propnex_row(i, town, district, price))
        if i % 10 == 0:
            dup = _srx_row(i, town, district, price)
            # same cleaned (location, price) as the propnex twin
            dup["location"] = f"{100 + i % 800} {town.title()} Street {i % 90 + 1}"
            srx.append(dup)
        else:
            j = i + n_rows  # disjoint id space → distinct locations
            town2, district2 = _TOWNS[j % len(_TOWNS)]
            srx.append(_srx_row(j, town2, district2, 300_000 + (j * 104_729) % 900_000))
    p = os.path.join(out_dir, "propnex.json")
    s = os.path.join(out_dir, "srx.json")
    with open(p, "w") as f:
        json.dump(propnex, f, indent=1)
    with open(s, "w") as f:
        json.dump(srx, f, indent=1)
    return p, s
