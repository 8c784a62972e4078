"""Synthetic raw fixtures matching the reference's scraper/API output
shapes (FIXTURES.md §1-3), with the adversarial edge values called out
there: 'None'/'' missing-value strings, emoji descriptions, Blk prefixes,
'(D16)'-only town lines, Studio/'3+1' bedrooms, KALLANG/WHAMPOA casing,
MULTI GENERATION flat type, and (location, price) duplicates with
different null counts for the dedup survivor check.
"""

from __future__ import annotations

# --- raw propnex listings (all values strings; FIXTURES.md §1) -------------

PROPNEX_ROWS: list[dict] = [
    {
        "url": "https://www.propnex.com/listing/1",
        "location": "Blk 123 Bedok North Road",
        "price": "$550,000",
        "price_psf": "$549 psf",
        "street_town_district": "Bedok North Road\nBedok (D16)",
        "num_bedroom": "3",
        "num_bathroom": "2",
        "floor_area_sqft": "1,001 sqft (93 sqm)",
        "agent_name": "John Tan",
        "agent_id": "#R012345A",
        "agent_email": "John.Tan@PROPNEX.com",
        "agent_phone_num": "+65 91234567",
        "listing_type": "SALE",
        "property_group": "HDB",
        "property_type": "HDB 4 Rooms",
        "district": "D16",
        "total_floor_area": "1001",
        "top": "1985",
        "furnishing": "Partially Furnished",
        "tenure": "99-year Leasehold",
        "floor": "High Floor",
        "post_code": "460123",
        "street_name": "BEDOK NORTH ROAD",
        "description": "Lovely home 🏠🌟\nnear MRT",
        "facilities": "Lift, Playground, Carpark",
    },
    {
        # numeric-only location → falls back to street name; missing town
        # line '(D10)' → NULL general_location; fully furnished mapping
        "url": "https://www.propnex.com/listing/2",
        "location": "Block 45",
        "price": "$1,200,000",
        "price_psf": "None",
        "street_town_district": "Holland Road\n(D10)",
        "num_bedroom": "5",
        "num_bathroom": "3",
        "floor_area_sqft": "1,600 sqft (149 sqm)",
        "agent_name": "Jane Lee",
        "agent_id": "#R054321B",
        "agent_email": "jane.lee@propnex.com",
        "agent_phone_num": "+65 98765432",
        "listing_type": "SALE",
        "property_group": "HDB",
        "property_type": "HDB 5 Rooms",
        "district": "D10",
        "total_floor_area": "1600",
        "top": "1999",
        "furnishing": "Fully Furnished",
        "tenure": "99-year Leasehold",
        "floor": "Mid Floor",
        "post_code": "278123",
        "street_name": "HOLLAND ROAD",
        "description": "None",
        "facilities": "None",
    },
    {
        # duplicate of srx row 1 by (location, price); has MORE nulls so
        # the srx twin must survive the merge dedup
        "url": "https://www.propnex.com/listing/3",
        "location": "Blk 8 Tampines Street 81",
        "price": "$480,000",
        "price_psf": "None",
        "street_town_district": "Tampines Street 81\nTampines (D18)",
        "num_bedroom": "None",
        "num_bathroom": "None",
        "floor_area_sqft": "None",
        "agent_name": "None",
        "agent_id": "#R099999Z",
        "agent_email": "bob@propnex.com",
        "agent_phone_num": "None",
        "listing_type": "SALE",
        "property_group": "HDB",
        "property_type": "HDB 4 Rooms",
        "district": "D18",
        "total_floor_area": "None",
        "top": "None",
        "furnishing": "None",
        "tenure": "None",
        "floor": "None",
        "post_code": "520881",
        "street_name": "TAMPINES STREET 81",
        "description": "",
        "facilities": "None",
    },
    {
        # NULL price → must be filtered by the merge's NOT-NULL gate
        "url": "https://www.propnex.com/listing/4",
        "location": "Blk 9 Yishun Ring Road",
        "price": "None",
        "price_psf": "None",
        "street_town_district": "Yishun Ring Road\nYishun (D27)",
        "num_bedroom": "4",
        "num_bathroom": "2",
        "floor_area_sqft": "1,184 sqft (110 sqm)",
        "agent_name": "Tan Ah Kow",
        "agent_id": "#R011111C",
        "agent_email": "tak@propnex.com",
        "agent_phone_num": "+65 90001111",
        "listing_type": "SALE",
        "property_group": "HDB",
        "property_type": "HDB 5 Rooms",
        "district": "D27",
        "total_floor_area": "1184",
        "top": "1992",
        "furnishing": "Unfurnished",
        "tenure": "99-year Leasehold",
        "floor": "Low Floor",
        "post_code": "760123",
        "street_name": "YISHUN RING ROAD",
        "description": "Spacious unit",
        "facilities": "Lift",
    },
]

# --- raw srx listings (FIXTURES.md §2) --------------------------------------

SRX_ROWS: list[dict] = [
    {
        # duplicate of propnex row 3 by (location, price), fewer nulls →
        # survivor
        "url": "https://www.srx.com.sg/listings/10",
        "location": "8 Tampines Street 81",
        "floor_size_psf": "1,001 sqft / $480 psf",
        "price": "$480,000",
        "num_bedroom": "4",
        "num_bathroom": "2",
        "description": "Renovated! 🎉",
        "agent_name": "Alice Wong ★",
        "agent_id": "CEA: R123456A / L3008022J",
        "agent_phone_num": "tel:91112222",
        "address": "8 Tampines Street 81 (520881)",
        "property_name": "TAMPINES STREET 81",
        "property_type": "HDB 4 Rooms",
        "model": "Model A",
        "bedrooms": "3+1",
        "bathrooms": "2",
        "furnish": "Partially Furnished",
        "floor_level": "Mid",
        "tenure": "99 years",
        "developer": "HDB",
        "built_year": "1988",
        "hdb_town": "Tampines",
        "asking": "$480,000",
        "size": "93 sqm",
        "psf": "$480 psf",
        "tenancy_status": "Vacant",
        "date_listed": "2024-10-15",
        "facilities": "Lift, Playground",
        "train_stations": "Tampines MRT EW2",
        "schools": "Tampines Primary",
        "shopping_mall/markets": "Tampines Mall",
    },
    {
        # Studio bedrooms; 'Not Furnished' mapping; no agency licence in
        # agent_id (regexp miss → '' → NULL)
        "url": "https://www.srx.com.sg/listings/11",
        "location": "302 Ang Mo Kio Ave 3",
        "floor_size_psf": "500 sqft / $900 psf",
        "price": "$450,000",
        "num_bedroom": "1",
        "num_bathroom": "1",
        "description": "Cosy studio",
        "agent_name": "Bob Lim",
        "agent_id": "CEA: R654321B",
        "agent_phone_num": "tel:93334444",
        "address": "302 Ang Mo Kio Ave 3 (560302)",
        "property_name": "ANG MO KIO AVENUE 3",
        "property_type": "HDB Studio",
        "model": "Improved",
        "bedrooms": "Studio",
        "bathrooms": "1",
        "furnish": "Not Furnished",
        "floor_level": "High",
        "tenure": "99 years",
        "developer": "HDB",
        "built_year": "1979",
        "hdb_town": "Ang Mo Kio",
        "asking": "$450,000",
        "size": "46 sqm",
        "psf": "$900 psf",
        "tenancy_status": "Vacant",
        "date_listed": "2024-10-20",
        "facilities": "None",
        "train_stations": "Ang Mo Kio MRT NS16",
        "schools": "None",
        "shopping_mall/markets": "AMK Hub",
        # junk bedrooms string on another row exercises the NULL path
    },
    {
        # junk bedrooms → NULL; missing location (None) → filtered at merge
        "url": "https://www.srx.com.sg/listings/12",
        "location": "None",
        "floor_size_psf": "None",
        "price": "$700,000",
        "num_bedroom": "None",
        "num_bathroom": "None",
        "description": "None",
        "agent_name": "Carol Ng",
        "agent_id": "CEA: R777777C / L3009250K",
        "agent_phone_num": "tel:95556666",
        "address": "None",
        "property_name": "None",
        "property_type": "HDB Executive",
        "model": "Apartment",
        "bedrooms": "abc",
        "bathrooms": "None",
        "furnish": "None",
        "floor_level": "None",
        "tenure": "None",
        "developer": "HDB",
        "built_year": "None",
        "hdb_town": "Bedok",
        "asking": "None",
        "size": "None",
        "psf": "None",
        "tenancy_status": "None",
        "date_listed": "None",
        "facilities": "None",
        "train_stations": "None",
        "schools": "None",
        "shopping_mall/markets": "None",
    },
]

# --- raw historical CSV rows (FIXTURES.md §3); two vintages -----------------

HISTORICAL_CSV_A = """month,town,flat_type,block,street_name,storey_range,floor_area_sqm,flat_model,lease_commence_date,resale_price
2017-03,BEDOK,4 ROOM,123,BEDOK NORTH ROAD,07 TO 09,93,New Generation,1985,550000
2017-04,KALLANG/WHAMPOA,3 ROOM,45,UPPER BOON KENG ROAD,10 TO 12,67,Improved,1979,380000
2018-01,TAMPINES,MULTI GENERATION,829,TAMPINES STREET 81,04 TO 06,160,Multi Generation,1988,720000
"""

# second vintage carries an extra column (remaining_lease) — exercises the
# multi-vintage projection conform (historical_data_transformation.py:22)
HISTORICAL_CSV_B = """month,town,flat_type,block,street_name,storey_range,floor_area_sqm,flat_model,lease_commence_date,resale_price,remaining_lease
2020-06,ANG MO KIO,5 ROOM,302,ANG MO KIO AVE 3,01 TO 03,110,Improved,1992,650000,71 years
2021-11,BEDOK,EXECUTIVE,55,BEDOK SOUTH AVENUE 1,13 TO 15,145,Apartment,1990,830000,68 years
"""


def write_listing_jsons(tmpdir: str) -> tuple[str, str]:
    """Write the propnex/srx rows as multiline row-array JSON — the
    scraper output shape read_listing_json (S3) expects."""
    import json
    import os

    p = os.path.join(tmpdir, "propnex.json")
    s = os.path.join(tmpdir, "srx.json")
    with open(p, "w") as f:
        json.dump(PROPNEX_ROWS, f, indent=1)
    with open(s, "w") as f:
        json.dump(SRX_ROWS, f, indent=1)
    return p, s


def write_historical_csvs(tmpdir: str) -> str:
    import os

    d = os.path.join(tmpdir, "historical_csv")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "resale_2017.csv"), "w") as f:
        f.write(HISTORICAL_CSV_A)
    with open(os.path.join(d, "resale_2020.csv"), "w") as f:
        f.write(HISTORICAL_CSV_B)
    return d
