"""spark-submit entry point for the pages pipeline.

``geotile/pipeline.py`` is a package module (relative imports), so it
cannot be handed to spark-submit directly as the primary script; this
top-level shim is the launchable file:

    sh scripts/make_pyfiles.sh
    spark-submit --master <cluster> --py-files dist/geotile.zip \
        scripts/submit_pipeline.py --n 1000000000 --workdir <table-root>

The session factory respects the launcher's master: spark-submit
--master sets the spark.master system property, which
geotile.session.get_spark detects (via SparkConf) and then skips its
local[. ] fallback; SPARK_GRAFT_MASTER overrides both.  Set
SPARK_GRAFT_CPUS to the per-executor core count so shuffle-partition
and GC-thread sizing match the allocation (the factory's other
settings — AQE, Arrow, shuffle partitions — apply unchanged).
"""

from geotile.pipeline import main

if __name__ == "__main__":
    main()
