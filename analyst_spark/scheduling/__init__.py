from analyst_spark.scheduling.cron import CronSchedule, parse_cron
from analyst_spark.scheduling.scheduler import Invocation, Scheduler, Task

__all__ = ["CronSchedule", "parse_cron", "Scheduler", "Task", "Invocation"]
