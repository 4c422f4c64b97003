"""Ingest-SQL parity layer (SURVEY.md §7 step 6).

Rebuilds the semantics of the reference's server-side ingest query
(configs/Lipac_query.sql) as a composed DataFrame pipeline over a
deterministic synthetic mini star schema — every join/window/rollup the
reference pushes to PostGIS, expressed Spark-side and DuckDB-checkable:

  J5 equi joins (stats x files x vignettes)          Lipac_query.sql:50,77
  J6 left joins (optional croisement, test rollup)   :78,127
  J7 two-key join (RGB x IRC on dalle+year)          :95-102
  J8/W1 as-of nearest-year ortho match               :121-132
  W2 DISTINCT ON (dalle_id, annee)                   :80-94
  A3 BOOL_OR test/exclusion rollup                   :103-109
  F6 derived boolean flags                           :62-72
  F7 quality filters + NULL-tolerant exclusion       :51,57,128-129
  X1 zero-padded patch id                            :113-115
  X2 EXTRACT(YEAR)                                   :29

Both the generators and the pipeline are pure arithmetic over row ids,
so the DuckDB oracle replays them exactly (ingest_parity_sql()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pacasam_spark.operators.hashing import det_hash, det_hash_sql

N_VIGNETTES = 10000
VIGNETTES_PER_DALLE = 16
N_FILES = 100


def _tables(spark: SparkSession) -> dict[str, DataFrame]:
    vid = F.col("id")
    vignette = spark.range(N_VIGNETTES).select(
        vid.alias("vignette_id"),
        (vid / VIGNETTES_PER_DALLE).cast("long").alias("dalle_id"),
        F.pmod(vid, F.lit(N_FILES)).alias("fichier_lidar_id"),
        (F.pmod(det_hash(vid, 11), F.lit(50)) != 0).alias("en_france"),
        F.pmod(det_hash(vid, 12), F.lit(1000)).alias("nb_bati"),
        (F.pmod(det_hash(vid, 13), F.lit(2000)) + 1).alias("nb_total"),
        F.pmod(det_hash(vid, 14), F.lit(100)).alias("nb_eau"),
    )
    fid = F.col("id")
    fichier_lidar = spark.range(N_FILES).select(
        fid.alias("fichier_lidar_id"),
        (F.pmod(det_hash(fid, 21), F.lit(5)) != 0).alias("version_de_reference"),
        (2018 + F.pmod(fid, F.lit(5))).alias("lidar_year"),
    )
    # fichier_ortho: per dalle, candidate years 2017..2023, present when
    # hash%3 != 0; one RVB and one IRC row each, with DUPLICATE rows
    # (rev 0/1) so DISTINCT ON has real work.
    n_dalles = N_VIGNETTES // VIGNETTES_PER_DALLE
    ortho = (
        spark.range(n_dalles)
        .select(F.col("id").alias("dalle_id"))
        .crossJoin(spark.range(2017, 2024).select(F.col("id").alias("annee")))
        .crossJoin(
            spark.createDataFrame([("RVB",), ("IRC",)], "canaux string")
        )
        .crossJoin(spark.range(2).select(F.col("id").alias("rev")))
        .withColumn("k", F.col("dalle_id") * 7 + F.col("annee"))
        .filter(F.pmod(det_hash(F.col("k"), 31), F.lit(3)) != 0)
        .withColumn(
            "chemin",
            F.concat(
                F.lit("/mnt/ortho/"),
                "canaux",
                F.lit("/"),
                F.col("annee").cast("string"),
                F.lit("/d"),
                F.col("dalle_id").cast("string"),
                F.lit("_r"),
                F.col("rev").cast("string"),
                F.lit(".tif"),
            ),
        )
        .drop("k")
    )
    did = F.col("id")
    jeu = spark.range(n_dalles).select(
        did.alias("dalle_id"),
        F.when(F.pmod(det_hash(did, 41), F.lit(5)) == 0, F.lit(True)).alias("test"),
        F.when(F.pmod(det_hash(did, 42), F.lit(20)) == 0, F.lit(True)).alias(
            "a_exclure"
        ),
    )
    return {
        "vignette": vignette,
        "fichier_lidar": fichier_lidar,
        "fichier_ortho": ortho,
        "jeu": jeu,
    }


def ingest_parity(spark: SparkSession) -> DataFrame:
    t = _tables(spark)

    # J5 + F7: stats x reference files, quality filters
    base = (
        t["vignette"]
        .join(t["fichier_lidar"], "fichier_lidar_id")  # J5
        .filter(F.col("version_de_reference"))  # F7 (:26)
        .filter(F.col("nb_total") > 0)  # F7 (:51)
        .filter(F.col("en_france"))  # F7 (:57)
    )

    # F6 derived boolean flags (:62-72)
    base = base.withColumn(
        "presence_bati", F.col("nb_bati") >= 500
    ).withColumn(
        "forte_proportion_bati",
        F.col("nb_bati") / (F.col("nb_total") + F.lit(1e-6)) >= 0.25,
    ).withColumn("presence_eau", F.col("nb_eau") >= 50)

    # W2: DISTINCT ON (dalle_id, annee) per channel (:80-94)
    w2 = Window.partitionBy("dalle_id", "annee", "canaux").orderBy("chemin")
    ortho1 = (
        t["fichier_ortho"]
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "rev")
    )
    # J7: RGB x IRC on (dalle_id, annee) (:95-102)
    rgb = ortho1.filter(F.col("canaux") == "RVB").select(
        "dalle_id", "annee", F.col("chemin").alias("rgb_file")
    )
    irc = ortho1.filter(F.col("canaux") == "IRC").select(
        "dalle_id", "annee", F.col("chemin").alias("irc_file")
    )
    pairs = rgb.join(irc, ["dalle_id", "annee"])

    # J8/W1: ortho vintage nearest the lidar year per vignette (:121-132)
    cand = base.join(pairs, "dalle_id")
    w1 = Window.partitionBy("vignette_id").orderBy(
        F.abs(F.col("annee") - F.col("lidar_year")), F.col("annee")
    )
    matched = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # A3 + J6: BOOL_OR rollup of test/exclusion per dalle, left join (:103-109,127)
    rollup = t["jeu"].groupBy("dalle_id").agg(
        F.bool_or("test").alias("test"), F.bool_or("a_exclure").alias("a_exclure")
    )
    out = matched.join(F.broadcast(rollup), "dalle_id", "left")
    # F7 NULL-tolerant exclusion (:128-129)
    out = out.filter(
        (F.col("a_exclure") == F.lit(False)) | F.col("a_exclure").isNull()
    )

    # X1 zero-padded patch id (:113-115)
    return out.select(
        F.concat(
            F.lit("D"),
            F.col("dalle_id").cast("string"),
            F.lit("-"),
            F.lpad(F.col("vignette_id").cast("string"), 9, "0"),
        ).alias("patch_id"),
        "vignette_id",
        "dalle_id",
        "lidar_year",
        F.col("annee").alias("ortho_year"),
        "rgb_file",
        "irc_file",
        "presence_bati",
        "forte_proportion_bati",
        "presence_eau",
        "test",
    )


def ingest_parity_sql() -> str:
    """DuckDB twin of :func:`ingest_parity` — same arithmetic, same
    windows, same joins."""
    n_dalles = N_VIGNETTES // VIGNETTES_PER_DALLE
    h = det_hash_sql
    return f"""
with vignette as (
  select range as vignette_id,
         range // {VIGNETTES_PER_DALLE} as dalle_id,
         range % {N_FILES} as fichier_lidar_id,
         ({h('range', 11)}) % 50 != 0 as en_france,
         ({h('range', 12)}) % 1000 as nb_bati,
         ({h('range', 13)}) % 2000 + 1 as nb_total,
         ({h('range', 14)}) % 100 as nb_eau
  from range({N_VIGNETTES})
),
fichier_lidar as (
  select range as fichier_lidar_id,
         ({h('range', 21)}) % 5 != 0 as version_de_reference,
         2018 + range % 5 as lidar_year
  from range({N_FILES})
),
ortho_raw as (
  select d.range as dalle_id, a.range as annee, c.canaux, r.range as rev,
         concat('/mnt/ortho/', c.canaux, '/', cast(a.range as varchar),
                '/d', cast(d.range as varchar), '_r',
                cast(r.range as varchar), '.tif') as chemin
  from range({n_dalles}) d, range(2017, 2024) a,
       (values ('RVB'), ('IRC')) c(canaux), range(2) r
  where ({h('(d.range * 7 + a.range)', 31)}) % 3 != 0
),
jeu as (
  select range as dalle_id,
         case when ({h('range', 41)}) % 5 = 0 then true end as test,
         case when ({h('range', 42)}) % 20 = 0 then true end as a_exclure
  from range({n_dalles})
),
base as (
  select v.*, f.lidar_year,
         v.nb_bati >= 500 as presence_bati,
         v.nb_bati / (v.nb_total + 1e-6) >= 0.25 as forte_proportion_bati,
         v.nb_eau >= 50 as presence_eau
  from vignette v join fichier_lidar f using (fichier_lidar_id)
  where f.version_de_reference and v.nb_total > 0 and v.en_france
),
ortho1 as (
  select * from (
    select *, row_number() over (partition by dalle_id, annee, canaux
                                 order by chemin) as rn
    from ortho_raw) t
  where rn = 1
),
pairs as (
  select r.dalle_id, r.annee, r.chemin as rgb_file, i.chemin as irc_file
  from (select * from ortho1 where canaux = 'RVB') r
  join (select * from ortho1 where canaux = 'IRC') i
    using (dalle_id, annee)
),
matched as (
  select * from (
    select b.*, p.annee, p.rgb_file, p.irc_file,
           row_number() over (partition by b.vignette_id
                              order by abs(p.annee - b.lidar_year), p.annee) as rn
    from base b join pairs p using (dalle_id)) t
  where rn = 1
),
rolled as (
  select m.*, j.test, j.a_exclure
  from matched m
  left join (select dalle_id, bool_or(test) as test,
                    bool_or(a_exclure) as a_exclure
             from jeu group by dalle_id) j using (dalle_id)
)
select concat('D', cast(dalle_id as varchar), '-',
              lpad(cast(vignette_id as varchar), 9, '0')) as patch_id,
       vignette_id, dalle_id, lidar_year, annee as ortho_year,
       rgb_file, irc_file, presence_bati, forte_proportion_bati,
       presence_eau, test
from rolled
where a_exclure = false or a_exclure is null
"""
