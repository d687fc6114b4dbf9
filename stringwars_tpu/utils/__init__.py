from stringwars_tpu.utils.config import (  # noqa: F401
    get_env,
    get_env_bool,
    get_env_or_default,
    get_env_parsed,
    parse_size,
    add_common_args,
    resolve_tokens,
    should_run,
    compile_filter,
)
from stringwars_tpu.utils.harness import (  # noqa: F401
    BenchBudget,
    WorkUnits,
    measure_throughput,
)
from stringwars_tpu.utils.report import (  # noqa: F401
    BenchStats,
    format_byte_rate,
    format_si_rate,
    format_seconds,
    scale_si,
    report_stats,
)
