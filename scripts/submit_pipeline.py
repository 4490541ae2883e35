"""spark-submit entry point for the pages pipeline.

``geotile/pipeline.py`` is a package module (relative imports), so it
cannot be handed to spark-submit directly as the primary script; this
top-level shim is the launchable file:

    sh scripts/make_pyfiles.sh
    spark-submit --master <cluster> --py-files dist/geotile.zip \
        scripts/submit_pipeline.py --n 1000000000 --workdir <table-root>

On a cluster, drop the session factory's local-mode master override by
exporting SPARK_GRAFT_CPUS to match the executor allocation (the
factory's other settings — AQE, Arrow, shuffle partitions — apply
unchanged).
"""

from geotile.pipeline import main

if __name__ == "__main__":
    main()
