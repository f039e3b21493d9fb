WITH stg_customers AS (
  SELECT
    CASE WHEN c_custkey % 97 = 0 THEN '' ELSE CAST(c_custkey AS VARCHAR) END AS customerid,
    CASE WHEN c_custkey % 11 = 0 THEN '  ' || c_name || '  ' ELSE c_name END AS customername,
    CASE WHEN c_custkey % 31 = 0 THEN ''
         WHEN c_custkey % 7 = 0 THEN lower(n_name)
         ELSE n_name END AS country,
    CASE WHEN c_custkey % 53 = 0 THEN 'not-a-date'
         ELSE strftime(DATE '1994-01-01' + CAST((c_custkey * 37) % 1460 AS INT), '%Y-%m-%d') END AS signupdate
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT CAST(c_custkey AS VARCHAR), c_name, n_name,
         strftime(DATE '1994-01-01' + CAST((c_custkey * 37) % 1460 + 30 AS INT), '%Y-%m-%d')
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_custkey % 13 = 0
),
stg_products AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS stockcode,
    p_name AS description,
    CASE WHEN p_partkey % 101 = 0 THEN 'N/A'
         WHEN p_partkey % 73 = 0 THEN '-1.00'
         WHEN p_partkey % 9 = 0 THEN '$' || CAST(CAST(round(p_retailprice * 100) / 100 AS DECIMAL(12,2)) AS VARCHAR)
         ELSE CAST(CAST(round(p_retailprice * 100) / 100 AS DECIMAL(12,2)) AS VARCHAR) END AS unitprice,
    CASE WHEN p_partkey % 5 = 0 THEN lower(split_part(p_type, ' ', 1))
         ELSE split_part(p_type, ' ', 1) END AS category,
    p_brand AS brand
  FROM part
),
stg_sales AS (
  SELECT
    CASE WHEN l_orderkey % 211 = 0 THEN '' ELSE CAST(l_orderkey AS VARCHAR) END AS invoiceid,
    CAST(l_partkey AS VARCHAR) AS stockcode,
    CAST(o_custkey AS VARCHAR) AS customerid,
    CASE WHEN (l_orderkey + l_linenumber) % 499 = 0 THEN 'invalid-ts'
         WHEN l_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
         ELSE strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') END AS saledate,
    CAST(CAST(l_quantity AS INT) AS VARCHAR) AS quantity,
    CASE WHEN l_orderkey % 89 = 0 THEN '0'
         WHEN l_orderkey % 7 = 0 THEN '$' || CAST(CAST(round(l_extendedprice / l_quantity * 100) / 100 AS DECIMAL(12,2)) AS VARCHAR)
         ELSE CAST(CAST(round(l_extendedprice / l_quantity * 100) / 100 AS DECIMAL(12,2)) AS VARCHAR) END AS unitprice,
    CASE WHEN l_orderkey % 3 = 0 THEN ''
         ELSE CAST(CAST(round(l_extendedprice * 100) / 100 AS DECIMAL(18,2)) AS VARCHAR) END AS totalamount,
    CAST(l_linenumber AS VARCHAR) AS linenumber
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
stg_date AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS d FROM orders
),
customers_base AS (
  SELECT trim(customerid) AS customerid,
         upper(substr(nullif(trim(customername),''),1,1)) || lower(substr(nullif(trim(customername),''),2)) AS customername,
         upper(substr(nullif(trim(country),''),1,1)) || lower(substr(nullif(trim(country),''),2)) AS country,
         CASE WHEN regexp_matches(trim(signupdate), '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
              THEN try_cast(trim(signupdate) AS DATE) ELSE NULL END AS signupdate
  FROM stg_customers
  WHERE coalesce(trim(customerid), '') <> ''
),
dim_customer AS (
  SELECT CAST(row_number() OVER (ORDER BY customerid) AS BIGINT) AS customer_key,
         customerid, customername, country, signupdate
  FROM (SELECT *, row_number() OVER (PARTITION BY customerid ORDER BY signupdate DESC NULLS LAST, customername) AS rn
        FROM customers_base) t
  WHERE rn = 1
),
dim_customer_elt AS (
  SELECT CAST(row_number() OVER (ORDER BY customerid) AS BIGINT) AS customer_key,
         customerid, customername, country, signupdate
  FROM (SELECT *, row_number() OVER (PARTITION BY customerid ORDER BY signupdate ASC NULLS FIRST, customername) AS rn
        FROM customers_base) t
  WHERE rn = 1
),
products_base AS (
  SELECT trim(stockcode) AS stockcode,
         upper(substr(nullif(trim(description),''),1,1)) || lower(substr(nullif(trim(description),''),2)) AS description,
         upper(substr(nullif(trim(category),''),1,1)) || lower(substr(nullif(trim(category),''),2)) AS category,
         trim(brand) AS brand,
         try_cast(nullif(regexp_replace(trim(unitprice), '[^0-9.-]', '', 'g'), '') AS DECIMAL(12,2)) AS unitprice_raw
  FROM stg_products
  WHERE coalesce(trim(stockcode), '') <> ''
),
products_dedup AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY stockcode ORDER BY stockcode) AS rn FROM products_base) t WHERE rn = 1
),
median_price AS (
  SELECT round(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(unitprice_raw AS DOUBLE)) * 100) / 100 AS median_up
  FROM products_dedup WHERE unitprice_raw > 0
),
dim_product AS (
  SELECT CAST(row_number() OVER (ORDER BY stockcode) AS BIGINT) AS product_key,
         stockcode, description,
         CAST(CASE WHEN unitprice_raw IS NULL OR unitprice_raw <= 0 THEN (SELECT median_up FROM median_price) ELSE unitprice_raw END AS DECIMAL(12,2)) AS unitprice,
         category, brand
  FROM products_dedup
),
sales_parsed AS (
  SELECT trim(invoiceid) AS invoiceid, trim(stockcode) AS stockcode, trim(customerid) AS customerid,
         coalesce(try_strptime(trim(saledate), '%Y-%m-%d %H:%M:%S'), try_strptime(trim(saledate), '%d/%m/%Y %H:%M:%S')) AS sale_ts,
         coalesce(try_cast(nullif(regexp_replace(trim(quantity), '[^0-9.-]', '', 'g'), '') AS INT), 0) AS quantity,
         try_cast(nullif(regexp_replace(trim(unitprice), '[^0-9.-]', '', 'g'), '') AS DECIMAL(12,2)) AS unitprice_num,
         try_cast(nullif(regexp_replace(trim(totalamount), '[^0-9.-]', '', 'g'), '') AS DECIMAL(18,2)) AS total_num,
         try_cast(linenumber AS INT) AS linenumber
  FROM stg_sales
  WHERE coalesce(trim(invoiceid), '') <> '' AND coalesce(trim(stockcode), '') <> ''
),
sales_final AS (
  SELECT s.invoiceid, s.stockcode, s.customerid, s.sale_ts, s.quantity, s.linenumber,
         CAST(CASE WHEN s.unitprice_num IS NULL OR s.unitprice_num <= 0 THEN p.unitprice ELSE s.unitprice_num END AS DECIMAL(12,2)) AS unitprice,
         CAST(CASE WHEN s.total_num IS NULL OR s.total_num = 0
              THEN round(s.quantity * (CASE WHEN s.unitprice_num IS NULL OR s.unitprice_num <= 0 THEN p.unitprice ELSE s.unitprice_num END), 2)
              ELSE s.total_num END AS DECIMAL(18,2)) AS totalamount
  FROM sales_parsed s LEFT JOIN dim_product p ON s.stockcode = p.stockcode
),
ts_domain AS (
  SELECT sale_ts AS ts FROM sales_parsed WHERE sale_ts IS NOT NULL
  UNION
  SELECT try_strptime(d || ' 00:00:00', '%Y-%m-%d %H:%M:%S') FROM stg_date
),
dim_date AS (
  SELECT CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS date_key,
         ts AS full_datetime,
         CAST(ts AS DATE) AS full_date,
         strftime(ts, '%H:%M:%S') AS full_time,
         CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month, CAST(day(ts) AS INT) AS day,
         CAST(hour(ts) AS INT) AS hour, CAST(minute(ts) AS INT) AS minute, CAST(second(ts) AS INT) AS second,
         dayname(ts) AS weekday,
         isodow(ts) IN (6, 7) AS is_weekend,
         CAST(quarter(ts) AS INT) AS quarter
  FROM ts_domain
),
fact_sales AS (
  SELECT coalesce(CAST(strftime(s.sale_ts, '%Y%m%d%H%M%S') AS BIGINT), 19700101000000) AS date_key,
         p.product_key, c.customer_key,
         s.invoiceid, s.stockcode, s.customerid, s.linenumber,
         s.quantity, s.unitprice, s.totalamount
  FROM sales_final s
  LEFT JOIN dim_product p ON s.stockcode = p.stockcode
  LEFT JOIN dim_customer c ON s.customerid = c.customerid
),
fact_sales_elt AS (
  -- load_ts is the ELT load audit stamp (reference ELT.sql:218-228); the
  -- engine injects a fixed clock so the hash compare stays deterministic
  SELECT f.date_key, f.product_key, c.customer_key, f.invoiceid, f.stockcode, f.customerid,
         f.linenumber, f.quantity, f.unitprice, f.totalamount,
         TIMESTAMP '2020-01-01 00:00:00' AS load_ts
  FROM (SELECT date_key, product_key, invoiceid, stockcode, customerid, linenumber, quantity, unitprice, totalamount FROM fact_sales) f
  LEFT JOIN dim_customer_elt c ON f.customerid = c.customerid
)
