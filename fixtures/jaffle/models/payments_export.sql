{{ config(materialized='table', file_format='orc') }}
select payment_id, payment_method, amount
from {{ ref('stg_payments') }}
