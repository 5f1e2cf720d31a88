// chamnet: native (C++/epoll) data plane for the retrieval service mesh.
//
// The reference's coordinator is a single-threaded Python select.poll loop
// (Chameleon ralm/coordinator/retriever_coordinator_server.py:26-285) — a
// documented serialization point between N LM workers and M retrieval
// engines.  This is the same relay re-implemented as a native epoll event
// loop with zero per-frame Python overhead: fixed-size request frames are
// scattered round-robin across engines; answers are gathered back to the
// originating client (FIFO per engine, matching the reference's
// query_gpu_ids bookkeeping).  Wire format unchanged (big-endian frames,
// chamjax/retrieval/wire.py).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <arpa/inet.h>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr int kMaxEvents = 64;

// --- small helpers ---------------------------------------------------------

int set_nodelay(int fd) {
  int one = 1;
  return setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
}

// Loop-until-n-bytes (blocking socket).  Returns 0 on success, -1 on
// EOF/error.
int recv_exact(int fd, uint8_t* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = recv(fd, buf + got, n - got, 0);
    if (r <= 0) {
      if (r < 0 && (errno == EINTR)) continue;
      return -1;
    }
    got += static_cast<size_t>(r);
  }
  return 0;
}

int send_all(int fd, const uint8_t* buf, size_t n) {
  size_t sent = 0;
  while (sent < n) {
    ssize_t r = send(fd, buf + sent, n - sent, MSG_NOSIGNAL);
    if (r <= 0) {
      if (r < 0 && errno == EINTR) continue;
      return -1;
    }
    sent += static_cast<size_t>(r);
  }
  return 0;
}

int make_listener(const char* host, int port, int backlog) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) { close(fd); return -1; }
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
      listen(fd, backlog) < 0) {
    close(fd);
    return -1;
  }
  return fd;
}

int connect_to(const char* host, int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1 ||
      connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    close(fd);
    return -1;
  }
  set_nodelay(fd);
  return fd;
}

// Engines bind their listen socket only after accelerator init (minutes
// through the remote tunnel) — retry like the Python coordinator does
// (service-mesh contract: connects retried until deadline_s of wall
// clock). The deadline is checked against elapsed TIME, not attempt
// count: a dropped SYN (filtering firewall) blocks each connect() for
// the kernel's ~2-min TCP timeout, which an attempt-counted loop would
// stretch to hours.
int connect_to_retry(const char* host, int port, int deadline_s) {
  const int sleep_us = 500 * 1000;
  timespec t0{};
  clock_gettime(CLOCK_MONOTONIC, &t0);
  for (;;) {
    int fd = connect_to(host, port);
    if (fd >= 0) return fd;
    timespec now{};
    clock_gettime(CLOCK_MONOTONIC, &now);
    if (now.tv_sec - t0.tv_sec >= deadline_s) return -1;
    usleep(sleep_us);
  }
}

// FIFO of origin-client ids per engine (reference query_gpu_ids).
struct EngineState {
  int fd = -1;
  std::vector<int> origin_fifo;
  size_t fifo_head = 0;

  void push(int client) { origin_fifo.push_back(client); }
  int pop() {
    int c = origin_fifo[fifo_head++];
    if (fifo_head > 1024 && fifo_head * 2 > origin_fifo.size()) {
      origin_fifo.erase(origin_fifo.begin(),
                        origin_fifo.begin() + static_cast<long>(fifo_head));
      fifo_head = 0;
    }
    return c;
  }
  bool empty() const { return fifo_head >= origin_fifo.size(); }
};

}  // namespace

extern "C" {

// Runs the full coordinator: accept n_clients, barrier-sync (4-byte echo),
// connect to engines, then relay until every client delivered
// queries_per_client answers (<=0: until all clients disconnect).
//
// engine_addrs: "host:port" strings, ';'-separated.
// Returns answered query count, or a negative errno-style code.
long long cham_coordinator_run(const char* host, int port, int n_clients,
                               long long request_bytes,
                               long long answer_bytes,
                               const char* engine_addrs,
                               long long queries_per_client) {
  // --- connect to engines ---
  std::vector<EngineState> engines;
  {
    std::string spec(engine_addrs ? engine_addrs : "");
    size_t pos = 0;
    while (pos < spec.size()) {
      size_t semi = spec.find(';', pos);
      if (semi == std::string::npos) semi = spec.size();
      std::string item = spec.substr(pos, semi - pos);
      pos = semi + 1;
      size_t colon = item.rfind(':');
      if (colon == std::string::npos) continue;
      EngineState es;
      es.fd = connect_to_retry(item.substr(0, colon).c_str(),
                               std::stoi(item.substr(colon + 1)), 900);
      if (es.fd < 0) {
        for (auto& e : engines) close(e.fd);
        return -2;
      }
      engines.push_back(es);
    }
  }
  if (engines.empty()) return -3;

  // --- accept clients ---
  int listener = make_listener(host, port, n_clients);
  if (listener < 0) {
    for (auto& e : engines) close(e.fd);
    return -1;
  }
  std::vector<int> clients;
  for (int i = 0; i < n_clients; ++i) {
    int c = accept(listener, nullptr, nullptr);
    if (c < 0) {
      close(listener);
      for (auto& e : engines) close(e.fd);
      for (int f : clients) close(f);
      return -4;
    }
    set_nodelay(c);
    clients.push_back(c);
  }
  close(listener);

  // --- barrier: echo 4 bytes per client (reference :106-122) ---
  for (int c : clients) {
    uint8_t b4[4];
    if (recv_exact(c, b4, 4) != 0 || send_all(c, b4, 4) != 0) {
      for (auto& e : engines) close(e.fd);
      for (int f : clients) close(f);
      return -5;
    }
  }

  // --- epoll relay loop ---
  int ep = epoll_create1(0);
  if (ep < 0) {
    // fd exhaustion: every epoll_ctl below would silently fail and
    // epoll_wait(-1) returns instantly — the relay would busy-spin forever
    for (auto& e : engines) close(e.fd);
    for (int f : clients) close(f);
    return -6;
  }
  // fd -> (is_client, index) lookup
  struct Peer { bool is_client; int idx; };
  std::vector<Peer> peer_of_fd;
  auto reg = [&](int fd, bool is_client, int idx) {
    if (static_cast<size_t>(fd) >= peer_of_fd.size())
      peer_of_fd.resize(fd + 1);
    peer_of_fd[fd] = {is_client, idx};
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = fd;
    epoll_ctl(ep, EPOLL_CTL_ADD, fd, &ev);
  };
  for (size_t i = 0; i < clients.size(); ++i) reg(clients[i], true, i);
  for (size_t i = 0; i < engines.size(); ++i) reg(engines[i].fd, false, i);

  std::vector<uint8_t> req(request_bytes), ans(answer_bytes);
  long long received = 0, answered = 0;
  long long total = queries_per_client > 0
                        ? queries_per_client * n_clients
                        : -1;
  int live_clients = n_clients;
  epoll_event events[kMaxEvents];

  while (live_clients > 0 && (total < 0 || answered < total)) {
    int n = epoll_wait(ep, events, kMaxEvents, 100);
    for (int i = 0; i < n; ++i) {
      int fd = events[i].data.fd;
      Peer p = peer_of_fd[fd];
      if (p.is_client) {
        if (recv_exact(fd, req.data(), req.size()) != 0) {
          epoll_ctl(ep, EPOLL_CTL_DEL, fd, nullptr);
          --live_clients;
          continue;
        }
        EngineState& e = engines[received % engines.size()];
        ++received;
        if (send_all(e.fd, req.data(), req.size()) != 0) goto done;
        e.push(fd);
      } else {
        EngineState& e = engines[p.idx];
        if (recv_exact(fd, ans.data(), ans.size()) != 0 || e.empty())
          goto done;
        int client_fd = e.pop();
        if (send_all(client_fd, ans.data(), ans.size()) != 0) {
          // client vanished mid-flight; drop the answer
        }
        ++answered;
      }
    }
  }

done:
  close(ep);
  for (auto& e : engines) close(e.fd);
  for (int f : clients) close(f);
  return answered;
}

// ---------------------------------------------------------------------------
// Fast vector-file IO (fvecs/bvecs/ivecs — TexMex layout: per-row i32 dim
// prefix).  The Python loaders mmap + strided-view; these fill a contiguous
// caller-allocated buffer with large sequential reads — the native analogue
// of the reference host program's bank-file loading (host.cpp:78-510).
// ---------------------------------------------------------------------------

// Reads up to max_rows rows from a {f,b,i}vecs file.  elem_size: 4 for
// fvecs/ivecs, 1 for bvecs.  out must hold max_rows*dim*elem_size bytes.
// Returns rows read, or negative on error (-1 open, -6 dim mismatch).
long long cham_read_vecs(const char* path, int elem_size, long long dim,
                         long long max_rows, void* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t* dst = static_cast<uint8_t*>(out);
  const size_t row_bytes = static_cast<size_t>(dim) * elem_size;
  long long rows = 0;
  while (rows < max_rows) {
    int32_t d = 0;
    size_t r = fread(&d, sizeof(d), 1, f);
    if (r != 1) break;  // EOF
    if (d != dim) { fclose(f); return -6; }
    if (fread(dst + rows * row_bytes, 1, row_bytes, f) != row_bytes) break;
    ++rows;
  }
  fclose(f);
  return rows;
}

// Probe a vecs file: returns dim (first row's prefix) or negative on error.
long long cham_vecs_dim(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t d = 0;
  size_t r = fread(&d, sizeof(d), 1, f);
  fclose(f);
  return r == 1 ? d : -7;
}

}  // extern "C"
