// av1tpu-daemon: CLI entry point for the encoding daemon.
// Mirrors the reference cli-daemon (main.rs:17-71): --config, --temp-dir,
// --skip-checks; plus --once (single scan cycle + drain, for tests/cron)
// and --metrics-port.
#include <csignal>
#include <cstdio>
#include <cstring>
#include <string>

#include "daemon.h"

static av1d::Daemon *g_daemon = nullptr;

static void handle_signal(int) {
  if (g_daemon) g_daemon->request_stop();
}

static void usage(const char *argv0) {
  printf(
      "usage: %s [--config PATH] [--temp-dir PATH] [--skip-checks]\n"
      "          [--once] [--metrics-port N]\n\n"
      "AV1 encoding daemon (TPU encode plane): scans library roots,\n"
      "gates/classifies candidates, encodes to AV1, validates, size-gates\n"
      "and atomically replaces originals.  GET /metrics on 127.0.0.1 serves\n"
      "a JSON snapshot.\n",
      argv0);
}

int main(int argc, char **argv) {
  av1d::DaemonOptions opts;
  bool once = false;
  for (int i = 1; i < argc; i++) {
    auto need = [&](const char *name) -> const char * {
      if (i + 1 >= argc) {
        fprintf(stderr, "%s requires a value\n", name);
        exit(2);
      }
      return argv[++i];
    };
    if (!strcmp(argv[i], "--config")) opts.config_path = need("--config");
    else if (!strcmp(argv[i], "--temp-dir")) opts.temp_dir = need("--temp-dir");
    else if (!strcmp(argv[i], "--skip-checks")) opts.skip_checks = true;
    else if (!strcmp(argv[i], "--once")) once = true;
    else if (!strcmp(argv[i], "--metrics-port"))
      opts.metrics_port = atoi(need("--metrics-port"));
    else if (!strcmp(argv[i], "--help") || !strcmp(argv[i], "-h")) {
      usage(argv[0]);
      return 0;
    } else {
      fprintf(stderr, "unknown argument: %s\n", argv[i]);
      usage(argv[0]);
      return 2;
    }
  }

  av1d::Daemon daemon;
  std::string err;
  if (!daemon.init(opts, &err)) {
    fprintf(stderr, "init failed: %s\n", err.c_str());
    return 1;
  }
  const auto &p = daemon.plan();
  printf("av1tpu-daemon starting\n");
  printf("  cores=%d target_threads=%d workers/job=%d max_jobs=%d\n",
         p.total_cores, p.target_threads, p.workers_per_job,
         p.max_concurrent_jobs);
  printf("  job_state_dir=%s\n", daemon.config().paths.job_state_dir.c_str());
  printf("  temp_output_dir=%s\n",
         daemon.config().paths.temp_output_dir.c_str());

  g_daemon = &daemon;
  signal(SIGINT, handle_signal);
  signal(SIGTERM, handle_signal);

  if (once) {
    daemon.run_once();
    printf("done: completed=%llu failed=%llu\n",
           (unsigned long long)daemon.metrics()->get().completed_jobs,
           (unsigned long long)daemon.metrics()->get().failed_jobs);
  } else {
    daemon.run_with_scanning();
  }
  daemon.stop();
  return 0;
}
