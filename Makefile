.PHONY: test gate bench package submit-example

test:
	python -m pytest tests/ -x -q

gate:
	python scripts/check_entry.py

bench:
	python bench.py

package:
	sh scripts/build_pyfiles.sh

submit-example: package
	/opt/spark/bin/spark-submit --master 'local[8]' \
	  --py-files dist/log_project_spark.zip jobs/run_pipeline.py \
	  --synth-rows 20000 --mode len --out-dir /tmp/lps_sinks \
	  --summary-out /tmp/lps_summary.csv
