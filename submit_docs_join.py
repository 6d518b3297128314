"""spark-submit launcher for the flagship docs spatial-join pipeline.

spark-submit takes a SCRIPT path (not a module), and the job module uses
package-relative imports, so this thin shim is what gets submitted; the
package itself ships via --py-files:

    spark-submit --master <cluster> \\
        --py-files nettopologysuite_spark.zip \\
        submit_docs_join.py --input /data/sf0.1 --output /out/run1 [--level 6]

End-to-end gated by tests/test_jobs.py::test_spark_submit_with_py_files_zip
(builds the zip, submits from a clean cwd so the package resolves only
through --py-files, and checks the committed stages + summary output).
"""

from nettopologysuite_spark.jobs.docs_join_job import main

if __name__ == "__main__":
    main()
