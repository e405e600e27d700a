from datacollector_spark.sources.generator import (  # noqa: F401
    ChangelogSpec,
    generate_changelog,
    write_segments,
)
