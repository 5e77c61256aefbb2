from aopwiki_spark.synth.gen import ensure_corpus, generate_corpus  # noqa: F401
