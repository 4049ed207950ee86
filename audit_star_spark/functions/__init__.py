from audit_star_spark.functions.maps import (  # noqa: F401
    map_diff,
    map_key_present,
    map_lookup,
    map_to_json,
    row_to_map,
    truncate_values,
)
