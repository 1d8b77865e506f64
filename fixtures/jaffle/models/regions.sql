with src as (
    select * from {{ source('warehouse', 'region_lookup') }}
)
select region_id, upper(region_name) as region_name
from src
