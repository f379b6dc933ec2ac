-- graft-sql demo: the reference-user workflow, end to end.
--   graft-sql --data /root/testdata/sf0.001 --hivevar min_tokens=10 \
--             --hivevar exp_dir=/tmp/demo_export -f demo/corpus_build.q
-- Exercises: variable substitution, temp views, multi-insert (one scan
-- feeds both sinks), and EXPORT — the CliDriver + Driver.compile path.

SET hive.exec.demo.marker=corpus_build;

CREATE OR REPLACE TEMPORARY VIEW corpus AS
SELECT doc_id, lang, text, size(split(trim(text), ' ')) AS n_tokens
FROM documents;

CREATE TABLE IF NOT EXISTS demo_keep (doc_id BIGINT, lang STRING) USING parquet;
CREATE TABLE IF NOT EXISTS demo_drop (doc_id BIGINT, n_tokens INT) USING parquet;

-- Hive multi-insert: ONE scan of `corpus` fans out to both tables
FROM corpus
INSERT OVERWRITE TABLE demo_keep SELECT doc_id, lang WHERE n_tokens >= ${hivevar:min_tokens}
INSERT OVERWRITE TABLE demo_drop SELECT doc_id, n_tokens WHERE n_tokens < ${hivevar:min_tokens};

SELECT 'kept' AS bucket, count(*) AS n FROM demo_keep;
SELECT 'dropped' AS bucket, count(*) AS n FROM demo_drop;

EXPORT TABLE demo_keep TO '${hivevar:exp_dir}';
