import os, sys, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from pyspark.sql import functions as F
from adfs_spark.session import get_spark
from adfs_spark.queries import QUERIES
from adfs_spark.functions import text as T
spark = get_spark("tok-ab-sf100")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/repo/fixtures/sf100"
df = spark.read.parquet(os.path.join(SF, "documents.parquet"))
spark.sparkContext.setJobDescription("warmup")
df.select(F.sum(F.length("text"))).collect()

def timeit(tag, frame, passes=3):
    best = None
    for p in range(passes):
        spark.sparkContext.setJobDescription(f"{tag} p{p}")
        t0 = time.time()
        frame.write.format("noop").mode("overwrite").save()
        t = round(time.time()-t0, 2)
        best = t if best is None else min(best, t)
        print(f"{tag} p{p}: {t}", flush=True)
        spark.catalog.clearCache()
    print(f"{tag} best: {best}", flush=True)

split_form = df.select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))).alias("tok")).select(F.xxhash64("tok").alias("h"))
rex_form = df.select(F.explode(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).alias("tok")).select(F.xxhash64("tok").alias("h"))
timeit("m_split_filter", split_form)
timeit("m_regexp_extract_all", rex_form)

# sanity: identical token multisets
a = split_form.groupBy("h").count()
b = rex_form.groupBy("h").count()
print("identical token multisets:", a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), flush=True)

# end-to-end tfidf with each tokenizer
fn, _ = QUERIES["text_tfidf_top_terms"]
timeit("tfidf_split(current)", fn(spark, SF))
orig = T.whitespace_tokens
T.whitespace_tokens = lambda text: F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))
timeit("tfidf_regexp(patched)", fn(spark, SF))
T.whitespace_tokens = orig
timeit("tfidf_split_again", fn(spark, SF), 2)
