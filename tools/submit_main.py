"""spark-submit entry (north rule: deployed with spark-submit --py-files).

Usage:
  python -c "import zipfile,os; z=zipfile.ZipFile('/tmp/sparkharvester.zip','w'); \
    [z.write(os.path.join(r,f), os.path.join(r,f)) for r,_,fs in os.walk('sparkharvester') \
     for f in fs if f.endswith('.py')]; z.close()"
  spark-submit --master local[8] --py-files /tmp/sparkharvester.zip \
      tools/submit_main.py --hosts 3 --max-depth 2 --out /tmp/submit_out

The script resolves sparkharvester from the --py-files zip (no repo on
sys.path), proving the engine deploys as a self-contained artifact to a
cluster whose executors only receive the zip.
"""
import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("sparkharvester-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # sparkharvester resolves from the --py-files zip
    from sparkharvester.frontier import CrawlConfig, run_crawl
    from sparkharvester.synth import SynthConfig, seed_urls

    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    synth = SynthConfig(n_hosts=int(args.get("--hosts", "3")),
                        pages_per_host=int(args.get("--pages", "15")))
    cfg = CrawlConfig(max_depth=int(args.get("--max-depth", "2")),
                      max_pages=int(args.get("--max-pages", "10")))
    eng = run_crawl(spark, seed_urls(synth), synth, cfg)
    print("SUBMIT_RESULT " + json.dumps({
        "pages": eng.pages.count(), "stats": eng.stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
