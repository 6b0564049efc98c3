-- The reference SQL corpus (/root/reference/tests/bin/tests.sql:1-407)
-- transliterated statement-by-statement, IN SEQUENCE, to the graft Spark
-- SQL surface. CorpusSqlSpec executes every statement of this file from
-- top to bottom against the registered collection views, so any drift in
-- the function registry, view schemas, or SQL dialect support breaks the
-- suite structurally rather than per hand-picked case.
--
-- Transliteration conventions (see SURVEY.md and the dedicated
-- CorpusSqlSpec cases for semantics-level checks of each form):
--   V_SEARCH(v)            -> v_cosine(vector, v)         (default metric)
--   V_SEARCH('field', v)   -> v_cosine(<field>, v)        (named column)
--   V_SEARCH('<id>')       -> v_cosine(vector, (SELECT vector ... id))
--   V_SPARSE_SEARCH        -> v_sparse_dot over the two-column convention
--   V_RECOMMEND            -> zip_with average of example vectors
--   V_DISCOVER             -> weighted sum of context similarities
--   V_FUSION(..., 'rrf')   -> reciprocal-rank sum over ranked branches
--   V_RANDOM()             -> md5(id || seed) permutation
--   payload->'k'           -> json_get_* / json_as_text / has_field
--   tags @> '["x"]'        -> array_contains(from_json(json_get_json(...)))
--   POINT(lat, lon)        -> point(lat, lon)
-- Reference vectors keep their original (short) literal dimensions: the
-- kernels score over the common prefix by design, which is exactly what
-- the reference's own edge-case section (tests.sql:389-392) relies on.

-- tests.sql:10-13 — single vector search (unnamed/default vector)
SELECT id, payload, v_cosine(vector, array(0.1D, 0.2D, 0.3D, 0.4D)) AS score
FROM embeddings_collection
ORDER BY score DESC
LIMIT 10;

-- tests.sql:16-19 — named vector search
SELECT id, payload, v_cosine(text_embedding, array(0.1D, 0.2D, 0.3D)) AS score
FROM hetero_collection
WHERE text_embedding IS NOT NULL
ORDER BY score DESC
LIMIT 10;

-- tests.sql:22-25 — search by point ID (similar points to the given id)
SELECT id, payload,
       v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '0')) AS score
FROM embeddings_collection
WHERE id <> '0'
ORDER BY score DESC
LIMIT 10;

-- tests.sql:28-35 — multiple named vector searches in a single query
SELECT
    id,
    v_cosine(text_embedding, array(0.1D, 0.2D)) AS text_score,
    v_cosine(image_embedding, array(0.3D, 0.4D, 0.5D)) AS image_score,
    payload
FROM hetero_collection
WHERE text_embedding IS NOT NULL AND image_embedding IS NOT NULL
ORDER BY text_score * 0.7 + image_score * 0.3 DESC
LIMIT 20;

-- tests.sql:42-45 — distance calculation with a specific metric
SELECT id, payload, v_distance(vector, array(0.1D, 0.2D, 0.3D), 'cosine') AS distance
FROM embeddings_collection
WHERE v_distance(vector, array(0.1D, 0.2D, 0.3D), 'cosine') < 0.5
ORDER BY distance ASC
LIMIT 100;

-- tests.sql:48-51 — radius search (boolean within)
SELECT id, payload
FROM embeddings_collection
WHERE v_within(vector, array(0.1D, 0.2D, 0.3D), 0.5)
LIMIT 100;

-- tests.sql:54-60 — combined vector and payload filtering
SELECT id, payload, v_cosine(vector, array(0.1D, 0.2D)) AS score
FROM embeddings_collection
WHERE json_as_text(payload, 'label') = '2'
  AND json_get_int(payload, 'label') > 1
  AND json_get_int(payload, 'label') < 5
ORDER BY score DESC
LIMIT 10;

-- tests.sql:67-70 — basic sparse vector search
SELECT id, payload,
       v_sparse_dot(keywords_indices, keywords_values,
                    array(1, 100, 500),
                    array(CAST(0.1 AS FLOAT), CAST(0.8 AS FLOAT), CAST(0.2 AS FLOAT))) AS score
FROM hetero_collection
WHERE keywords_indices IS NOT NULL
ORDER BY score DESC
LIMIT 10;

-- tests.sql:73-76 — named sparse vector search (the named field IS the
-- two-column pair on the heterogeneous collection)
SELECT id, payload,
       v_sparse_dot(keywords_indices, keywords_values,
                    array(10, 20, 30),
                    array(CAST(0.5 AS FLOAT), CAST(0.3 AS FLOAT), CAST(0.7 AS FLOAT))) AS score
FROM hetero_collection
WHERE keywords_indices IS NOT NULL
ORDER BY score DESC
LIMIT 10;

-- tests.sql:83-86 — recommend with positive examples only (by point id):
-- the query point is the element-wise average of the example vectors
WITH examples AS (
    SELECT (SELECT vector FROM embeddings_collection WHERE id = '1') AS p1,
           (SELECT vector FROM embeddings_collection WHERE id = '2') AS p2
)
SELECT id, payload,
       v_cosine(vector, transform(zip_with(p1, p2, (x, y) -> x + y),
                                  v -> v / 2.0D)) AS score
FROM embeddings_collection, examples
WHERE id NOT IN ('1', '2')
ORDER BY score DESC
LIMIT 10;

-- tests.sql:89-95 — recommend with positive AND negative examples:
-- avg(positive) minus avg(negative) as the query direction
WITH examples AS (
    SELECT (SELECT vector FROM embeddings_collection WHERE id = '1') AS p1,
           (SELECT vector FROM embeddings_collection WHERE id = '2') AS p2,
           (SELECT vector FROM embeddings_collection WHERE id = '3') AS n1,
           (SELECT vector FROM embeddings_collection WHERE id = '4') AS n2
)
SELECT id, payload,
       v_cosine(vector, zip_with(
         transform(zip_with(p1, p2, (x, y) -> x + y), v -> v / 2.0D),
         transform(zip_with(n1, n2, (x, y) -> x + y), v -> v / 2.0D),
         (p, n) -> p - n)) AS score
FROM embeddings_collection, examples
WHERE id NOT IN ('1', '2', '3', '4')
ORDER BY score DESC
LIMIT 10;

-- tests.sql:98-104 — recommend with vector literals instead of ids
SELECT id, payload,
       v_cosine(vector, transform(
         zip_with(array(0.1D, 0.2D, 0.3D), array(0.4D, 0.5D, 0.6D), (x, y) -> x + y),
         v -> v / 2.0D)) AS score
FROM embeddings_collection
ORDER BY score DESC
LIMIT 10;

-- tests.sql:107-114 — named vector recommendation
WITH examples AS (
    SELECT (SELECT image_embedding FROM hetero_collection WHERE id = '2') AS p1,
           (SELECT image_embedding FROM hetero_collection WHERE id = '5') AS p2
)
SELECT id, payload,
       v_cosine(image_embedding, transform(zip_with(p1, p2, (x, y) -> x + y),
                                           v -> v / 2.0D)) AS score
FROM hetero_collection, examples
WHERE image_embedding IS NOT NULL AND id NOT IN ('2', '5')
ORDER BY score DESC
LIMIT 10;

-- tests.sql:121-127 — basic discovery (target with weighted context)
SELECT id, payload,
       v_cosine(vector, array(0.1D, 0.2D, 0.3D))
       + 0.5 * v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '1'))
       + 0.3 * v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '2')) AS score
FROM embeddings_collection
ORDER BY score DESC
LIMIT 10;

-- tests.sql:130-137 — discovery with a named vector
SELECT id, payload,
       v_cosine(text_embedding, array(0.1D, 0.2D, 0.3D))
       + 0.8 * v_cosine(text_embedding, (SELECT text_embedding FROM hetero_collection WHERE id = '1'))
       + 0.2 * v_cosine(text_embedding, (SELECT text_embedding FROM hetero_collection WHERE id = '4')) AS score
FROM hetero_collection
WHERE text_embedding IS NOT NULL
ORDER BY score DESC
LIMIT 10;

-- tests.sql:144-154 — two-stage search: broad prefetch, then rerank
WITH prefetch AS (
    SELECT id, payload,
           v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '0')) AS initial_score
    FROM embeddings_collection
    ORDER BY initial_score DESC
    LIMIT 100
)
SELECT id, payload,
       v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '1')) AS final_score
FROM embeddings_collection
WHERE id IN (SELECT id FROM prefetch)
ORDER BY final_score DESC
LIMIT 10;

-- tests.sql:157-168 — ColBERT-style multi-vector reranking of a prefetch
WITH prefetch AS (
    SELECT * FROM hetero_collection
    WHERE multi_embeddings IS NOT NULL
    ORDER BY v_cosine(text_embedding, array(1.0D, 23.0D, 45.0D, 67.0D)) DESC
    LIMIT 100
)
SELECT id, payload,
       v_maxsim(multi_embeddings,
                (SELECT multi_embeddings FROM hetero_collection WHERE id = '0')) AS score
FROM prefetch
ORDER BY score DESC
LIMIT 10;

-- tests.sql:175-196 — RRF fusion of a sparse and a dense branch
WITH
sparse_results AS (
    SELECT id, row_number() OVER (ORDER BY
             v_sparse_dot(keywords_indices, keywords_values,
                          array(1, 42),
                          array(CAST(0.22 AS FLOAT), CAST(0.8 AS FLOAT))) DESC, id) AS rn
    FROM hetero_collection
    WHERE keywords_indices IS NOT NULL
    LIMIT 20
),
dense_results AS (
    SELECT id, row_number() OVER (ORDER BY
             v_cosine(vector, array(0.01D, 0.45D, 0.67D)) DESC, id) AS rn
    FROM embeddings_collection
    LIMIT 20
)
SELECT
    c.id,
    c.payload,
    1.0D / (60 + s.rn) + 1.0D / (60 + d.rn) AS fused_score
FROM embeddings_collection c
JOIN sparse_results s ON c.id = s.id
JOIN dense_results d ON c.id = d.id
ORDER BY fused_score DESC
LIMIT 10;

-- tests.sql:203-207 — field-existence filter combined with a score gate
SELECT id, payload
FROM embeddings_collection
WHERE has_field(payload, 'discontinued') = false
  AND v_cosine(vector, array(0.1D, 0.2D)) > 0.5
LIMIT 10;

-- tests.sql:210-214 — full text search on a payload-like text field
SELECT doc_id, match_text(text, 'machine learning') AS text_score
FROM documents_collection
WHERE match_text(text, 'machine learning') > 0.0
ORDER BY text_score DESC, doc_id
LIMIT 10;

-- tests.sql:217-226 — nested payload access + @> containment
SELECT
    id,
    json_get_str(p, 'address', 'city') AS city,
    json_get_json(p, 'tags') AS tags,
    v_cosine(vector, array(0.1D, 0.2D)) AS score
FROM (SELECT id, vector,
             to_json(named_struct(
               'address', named_struct('city', 'berlin', 'country', 'USA'),
               'tags', array('electronics'))) AS p
      FROM embeddings_collection)
WHERE json_get_str(p, 'address', 'country') = 'USA'
  AND array_contains(from_json(json_get_json(p, 'tags'), 'array<string>'), 'electronics')
ORDER BY score DESC
LIMIT 10;

-- tests.sql:233-242 — group by payload field over search scores
SELECT
    json_get_int(payload, 'label') AS author,
    COUNT(*) AS point_count,
    MAX(v_cosine(vector, array(0.1D, 0.2D, 0.3D))) AS best_score,
    AVG(v_cosine(vector, array(0.1D, 0.2D, 0.3D))) AS avg_score
FROM embeddings_collection
GROUP BY json_get_int(payload, 'label')
HAVING COUNT(*) >= 3
ORDER BY best_score DESC
LIMIT 10;

-- tests.sql:245-251 — count vectors in radius by category
SELECT
    json_get_int(payload, 'label') AS category,
    COUNT(*) AS count_in_radius
FROM embeddings_collection
WHERE v_within(vector, array(0.1D, 0.2D, 0.3D), 0.5)
GROUP BY json_get_int(payload, 'label')
ORDER BY count_in_radius DESC
LIMIT 100;

-- tests.sql:258-279 — boost score based on payload conditions
WITH base_search AS (
    SELECT
        id,
        payload,
        v_cosine(vector, array(0.2D, 0.8D, 0.1D)) AS base_score
    FROM embeddings_collection
    ORDER BY base_score DESC
    LIMIT 50
)
SELECT
    id,
    payload,
    base_score,
    base_score +
    CASE
        WHEN json_get_int(payload, 'label') IN (1, 2, 3, 4) THEN 0.5
        WHEN json_get_int(payload, 'label') IN (5, 6) THEN 0.25
        ELSE 0
    END AS boosted_score
FROM base_search
ORDER BY boosted_score DESC
LIMIT 10;

-- tests.sql:282-303 — geographic distance decay boosting (JSON location
-- object + POINT constructor, exactly the corpus call shape)
WITH base_search AS (
    SELECT
        id,
        payload,
        to_json(named_struct(
          'lat', 52.504043D + json_get_float(payload, 'label') * 0.01D,
          'lon', 13.393236D)) AS location,
        v_cosine(vector, array(0.2D, 0.8D)) AS base_score
    FROM embeddings_collection
    LIMIT 50
)
SELECT
    id,
    payload,
    base_score,
    base_score + v_gauss_decay(
        v_geo_distance(
            location,
            point(52.504043D, 13.393236D)
        ),
        5000.0D
    ) AS final_score
FROM base_search
ORDER BY final_score DESC
LIMIT 10;

-- tests.sql:309-313 — random sampling of points (seeded permutation)
SELECT id, payload
FROM embeddings_collection
ORDER BY md5(id || '42'), id
LIMIT 10;

-- tests.sql:316-320 — random sample with filtering
SELECT id, payload
FROM embeddings_collection
WHERE json_get_int(payload, 'label') = 1
ORDER BY md5(id || '42'), id
LIMIT 5;

-- tests.sql:327-344 — batch similarity search (multiple queries, LATERAL)
WITH queries AS (
    SELECT * FROM (VALUES
        (1, array(0.1D, 0.2D, 0.3D)),
        (2, array(0.4D, 0.5D, 0.6D)),
        (3, array(0.7D, 0.8D, 0.9D))
    ) AS t(query_id, query_vector)
)
SELECT
    q.query_id,
    c.id AS point_id,
    c.payload,
    c.score
FROM queries q,
LATERAL (
    SELECT id, payload, v_cosine(vector, q.query_vector) AS score
    FROM embeddings_collection
    ORDER BY score DESC, id
    LIMIT 5
) c;

-- tests.sql:351-383 — multi-vector fusion with payload filtering and boost
WITH
text_search AS (
    SELECT
        id,
        row_number() OVER (ORDER BY
          v_cosine(text_embedding, array(0.1D, 0.2D)) DESC, id) AS rn
    FROM hetero_collection
    WHERE text_embedding IS NOT NULL
      AND json_get_int(payload, 'label') >= 0
    LIMIT 50
),
image_search AS (
    SELECT
        id,
        row_number() OVER (ORDER BY
          v_cosine(image_embedding, array(0.3D, 0.4D, 0.5D)) DESC, id) AS rn
    FROM hetero_collection
    WHERE image_embedding IS NOT NULL
    LIMIT 50
)
SELECT
    c.id,
    c.payload,
    (1.0D / (60 + t.rn) + 1.0D / (60 + i.rn)) *
    CASE
        WHEN json_get_int(c.payload, 'label') = 1 THEN 1.2
        ELSE 1.0
    END AS final_score
FROM hetero_collection c
JOIN text_search t ON c.id = t.id
JOIN image_search i ON c.id = i.id
WHERE has_field(c.payload, 'label')
ORDER BY final_score DESC
LIMIT 10;

-- tests.sql:389-392 — empty vector search (handled gracefully)
SELECT id FROM embeddings_collection
WHERE v_cosine(vector, CAST(array() AS ARRAY<DOUBLE>)) IS NOT NULL
LIMIT 1;

-- tests.sql:395-398 — null handling in recommendations (no negatives)
SELECT id,
       v_cosine(vector, (SELECT vector FROM embeddings_collection WHERE id = '1')) AS score
FROM embeddings_collection
WHERE id <> '1'
ORDER BY score DESC
LIMIT 5;

-- tests.sql:401-407 — very high dimensional sparse vector
SELECT id,
       v_sparse_dot(keywords_indices, keywords_values,
                    array(1, 100, 500, 1000, 5000, 10000, 50000, 100000),
                    array(CAST(0.1 AS FLOAT), CAST(0.2 AS FLOAT), CAST(0.3 AS FLOAT),
                          CAST(0.4 AS FLOAT), CAST(0.5 AS FLOAT), CAST(0.6 AS FLOAT),
                          CAST(0.7 AS FLOAT), CAST(0.8 AS FLOAT))) AS score
FROM hetero_collection
WHERE keywords_indices IS NOT NULL
ORDER BY score DESC
LIMIT 10;
