{{ config(materialized='view', dbt_osmosis_output_to_lower=true) }}
with source as (
    {#- seeds stand in for the warehouse-loaded table here #}
    select * from {{ ref('raw_payments') }}
),
renamed as (
    select
        id as payment_id,
        order_id,
        payment_method,
        amount / 100.0 as amount
    from source
)
select * from renamed
