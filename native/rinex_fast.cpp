// Fast RINEX 3 observation-file decoder (native data-loader layer).
//
// The reference's GNSS I/O is native C (forked RTKLIB rinex.c, ~51.6k LoC
// of C); this framework keeps the same native boundary for the decode hot
// loop, re-implemented from the RINEX 3.03 spec in ~200 lines: tokenize
// epoch headers + per-satellite observable fields into flat arrays that
// Python/numpy consumes zero-copy via ctypes.
//
// Only what the pipeline needs: first C/L/D/S observable per satellite
// (L1/B1 processing, matching gnss_preprocessor.cpp nf=1).
//
// Build: scripts/build_native.sh  (g++ -O2 -shared -fPIC)

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Record {
  int epoch;
  char sys;
  int prn;
  double psr, carrier, doppler, snr;
  int lli;
};

struct ParseResult {
  std::vector<double> epoch_time_week;  // per epoch: week
  std::vector<double> epoch_time_tow;   // per epoch: tow
  std::vector<Record> records;
  double approx[3] = {0, 0, 0};
  bool has_approx = false;
};

// Field -> double; empty/garbled -> NaN.
double field(const char* s, int start, int len, int linelen) {
  if (start >= linelen) return nan("");
  char buf[32];
  int n = 0;
  for (int i = start; i < start + len && i < linelen && n < 31; i++) {
    if (!isspace((unsigned char)s[i]) || n > 0) buf[n++] = s[i];
  }
  while (n > 0 && isspace((unsigned char)buf[n - 1])) n--;
  if (n == 0) return nan("");
  buf[n] = 0;
  char* end = nullptr;
  double v = strtod(buf, &end);
  if (end == buf) return nan("");
  return v;
}

int civil2mjd(int y, int m, int d) {
  if (m <= 2) { y -= 1; m += 12; }
  int a = y / 100;
  int b = 2 - a + a / 4;
  return (int)(365.25 * (y + 4716)) + (int)(30.6001 * (m + 1)) + d + b
         - 1524 - 2400001;
}

}  // namespace

extern "C" {

// Opaque handle API.
void* rinex_obs_open(const char* path, const char* systems) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* res = new ParseResult();

  char line[512];
  // Per-system column picks for C/L/D/S.
  int picks[128][4];
  for (auto& p : picks) p[0] = p[1] = p[2] = p[3] = -1;

  // ---- header ----
  while (fgets(line, sizeof line, f)) {
    int len = (int)strlen(line);
    if (len < 61) {
      if (strstr(line, "END OF HEADER")) break;
      continue;
    }
    const char* label = line + 60;
    if (strncmp(label, "SYS / # / OBS TYPES", 19) == 0) {
      char sys = line[0];
      int n = atoi(std::string(line + 3, 3).c_str());
      std::vector<std::string> types;
      int remaining = n;
      const char* cur = line;
      while (remaining > 0) {
        for (int k = 0; k < 13 && (int)types.size() < n; k++) {
          int st = 7 + 4 * k;
          if (st + 3 > 60) break;
          std::string t(cur + st, 3);
          if (t[0] == ' ') continue;
          types.push_back(t);
        }
        remaining = n - (int)types.size();
        if (remaining > 0) {
          if (!fgets(line, sizeof line, f)) break;
          cur = line;
        }
      }
      for (int i = 0; i < (int)types.size(); i++) {
        char c0 = types[i][0];
        int slot = c0 == 'C' ? 0 : c0 == 'L' ? 1 : c0 == 'D' ? 2
                   : c0 == 'S' ? 3 : -1;
        if (slot >= 0 && picks[(int)sys][slot] < 0)
          picks[(int)sys][slot] = i;
      }
    } else if (strncmp(label, "APPROX POSITION XYZ", 19) == 0) {
      res->approx[0] = field(line, 0, 14, len);
      res->approx[1] = field(line, 14, 14, len);
      res->approx[2] = field(line, 28, 14, len);
      res->has_approx = true;
    } else if (strncmp(label, "END OF HEADER", 13) == 0) {
      break;
    }
  }

  // ---- body ----
  int epoch = -1;
  while (fgets(line, sizeof line, f)) {
    if (line[0] != '>') continue;
    int len = (int)strlen(line);
    int y = atoi(std::string(line + 2, 4).c_str());
    int mo = atoi(std::string(line + 7, 2).c_str());
    int dd = atoi(std::string(line + 10, 2).c_str());
    int hh = atoi(std::string(line + 13, 2).c_str());
    int mi = atoi(std::string(line + 16, 2).c_str());
    double ss = field(line, 18, 11, len);
    int flag = atoi(std::string(line + 31, 1).c_str());
    int nsat = atoi(std::string(line + 32, 3).c_str());
    int days = civil2mjd(y, mo, dd) - 44244;
    double week = days / 7;
    double tow = (days % 7) * 86400.0 + hh * 3600.0 + mi * 60.0 + ss;
    epoch++;
    res->epoch_time_week.push_back(week);
    res->epoch_time_tow.push_back(tow);
    bool usable = (flag == 0);
    for (int s = 0; s < nsat; s++) {
      if (!fgets(line, sizeof line, f)) break;
      if (!usable) continue;
      int ll = (int)strlen(line);
      char sys = line[0];
      if (!strchr(systems, sys)) continue;
      int prn = atoi(std::string(line + 1, 2).c_str());
      const int* pk = picks[(int)sys];
      if (pk[0] < 0) continue;
      double psr = field(line, 3 + 16 * pk[0], 14, ll);
      if (psr != psr) continue;  // NaN
      Record r;
      r.epoch = epoch;
      r.sys = sys;
      r.prn = prn;
      r.psr = psr;
      r.carrier = pk[1] >= 0 ? field(line, 3 + 16 * pk[1], 14, ll) : nan("");
      r.doppler = pk[2] >= 0 ? field(line, 3 + 16 * pk[2], 14, ll) : nan("");
      r.snr = pk[3] >= 0 ? field(line, 3 + 16 * pk[3], 14, ll) : nan("");
      int lli_col = pk[1];
      r.lli = 0;
      if (lli_col >= 0) {
        int p = 3 + 16 * lli_col + 14;
        if (p < ll && isdigit((unsigned char)line[p])) r.lli = line[p] - '0';
      }
      res->records.push_back(r);
    }
  }
  fclose(f);
  return res;
}

long rinex_obs_num_epochs(void* h) {
  return (long)((ParseResult*)h)->epoch_time_week.size();
}
long rinex_obs_num_records(void* h) {
  return (long)((ParseResult*)h)->records.size();
}
int rinex_obs_approx(void* h, double* out) {
  auto* r = (ParseResult*)h;
  memcpy(out, r->approx, sizeof r->approx);
  return r->has_approx ? 1 : 0;
}
void rinex_obs_epochs(void* h, double* week, double* tow) {
  auto* r = (ParseResult*)h;
  memcpy(week, r->epoch_time_week.data(),
         r->epoch_time_week.size() * sizeof(double));
  memcpy(tow, r->epoch_time_tow.data(),
         r->epoch_time_tow.size() * sizeof(double));
}
void rinex_obs_records(void* h, int* epoch, char* sys, int* prn, double* psr,
                       double* carrier, double* doppler, double* snr,
                       int* lli) {
  auto* r = (ParseResult*)h;
  for (size_t i = 0; i < r->records.size(); i++) {
    const Record& rec = r->records[i];
    epoch[i] = rec.epoch;
    sys[i] = rec.sys;
    prn[i] = rec.prn;
    psr[i] = rec.psr;
    carrier[i] = rec.carrier;
    doppler[i] = rec.doppler;
    snr[i] = rec.snr;
    lli[i] = rec.lli;
  }
}
void rinex_obs_close(void* h) { delete (ParseResult*)h; }

}  // extern "C"

// ---- RINEX 3 navigation (ephemeris) decoder --------------------------------

namespace {

struct NavRecord {
  char sys;
  int prn;
  int toc_y, toc_mo, toc_d, toc_h, toc_mi, toc_s;
  double clock[3];
  double body[28];
};

struct NavResult {
  std::vector<NavRecord> records;
};

double dfield(const char* s, int start, int len, int linelen) {
  if (start >= linelen) return nan("");
  char buf[32];
  int n = 0;
  for (int i = start; i < start + len && i < linelen && n < 31; i++) {
    char c = s[i];
    if (c == 'D' || c == 'd') c = 'E';
    if (!isspace((unsigned char)c) || n > 0) buf[n++] = c;
  }
  while (n > 0 && isspace((unsigned char)buf[n - 1])) n--;
  if (n == 0) return nan("");
  buf[n] = 0;
  char* end = nullptr;
  double v = strtod(buf, &end);
  if (end == buf) return nan("");
  return v;
}

}  // namespace

extern "C" {

void* rinex_nav_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* res = new NavResult();
  char line[256];
  // Skip header.
  while (fgets(line, sizeof line, f)) {
    if (strstr(line, "END OF HEADER")) break;
  }
  while (fgets(line, sizeof line, f)) {
    int len = (int)strlen(line);
    char sys = line[0];
    if (sys == 'R') {
      // GLONASS: 4-line state-vector records (header + 3 body lines of
      // 4 fields: x/vx/ax/health, y/vy/ay/freq#, z/vz/az/age); stored in
      // body[0..11], rest zero.  Epoch is UTC — the python wrapper does
      // the UTC(SU)→GPS conversion (rinex.py parse_nav 'R' branch).
      NavRecord r{};
      r.sys = sys;
      r.prn = atoi(std::string(line + 1, 2).c_str());
      r.toc_y = atoi(std::string(line + 4, 4).c_str());
      r.toc_mo = atoi(std::string(line + 9, 2).c_str());
      r.toc_d = atoi(std::string(line + 12, 2).c_str());
      r.toc_h = atoi(std::string(line + 15, 2).c_str());
      r.toc_mi = atoi(std::string(line + 18, 2).c_str());
      r.toc_s = atoi(std::string(line + 21, 2).c_str());
      int len0 = (int)strlen(line);
      for (int k = 0; k < 3; k++)
        r.clock[k] = dfield(line, 23 + 19 * k, 19, len0);
      bool ok = true;
      for (int l = 0; l < 3 && ok; l++) {
        if (!fgets(line, sizeof line, f)) { ok = false; break; }
        int ll = (int)strlen(line);
        for (int k = 0; k < 4; k++)
          r.body[l * 4 + k] = dfield(line, 4 + 19 * k, 19, ll);
      }
      if (ok) res->records.push_back(r);
      continue;
    }
    if (sys != 'G' && sys != 'C' && sys != 'E') continue;
    NavRecord r;
    r.sys = sys;
    r.prn = atoi(std::string(line + 1, 2).c_str());
    r.toc_y = atoi(std::string(line + 4, 4).c_str());
    r.toc_mo = atoi(std::string(line + 9, 2).c_str());
    r.toc_d = atoi(std::string(line + 12, 2).c_str());
    r.toc_h = atoi(std::string(line + 15, 2).c_str());
    r.toc_mi = atoi(std::string(line + 18, 2).c_str());
    r.toc_s = atoi(std::string(line + 21, 2).c_str());
    for (int k = 0; k < 3; k++)
      r.clock[k] = dfield(line, 23 + 19 * k, 19, len);
    bool ok = true;
    for (int l = 0; l < 7 && ok; l++) {
      if (!fgets(line, sizeof line, f)) { ok = false; break; }
      int ll = (int)strlen(line);
      for (int k = 0; k < 4; k++)
        r.body[l * 4 + k] = dfield(line, 4 + 19 * k, 19, ll);
    }
    if (ok) res->records.push_back(r);
  }
  fclose(f);
  return res;
}

long rinex_nav_count(void* h) {
  return (long)((NavResult*)h)->records.size();
}

void rinex_nav_records(void* h, char* sys, int* prn, int* toc,
                       double* clock, double* body) {
  auto* r = (NavResult*)h;
  for (size_t i = 0; i < r->records.size(); i++) {
    const NavRecord& rec = r->records[i];
    sys[i] = rec.sys;
    prn[i] = rec.prn;
    toc[6 * i + 0] = rec.toc_y;
    toc[6 * i + 1] = rec.toc_mo;
    toc[6 * i + 2] = rec.toc_d;
    toc[6 * i + 3] = rec.toc_h;
    toc[6 * i + 4] = rec.toc_mi;
    toc[6 * i + 5] = rec.toc_s;
    memcpy(clock + 3 * i, rec.clock, sizeof rec.clock);
    memcpy(body + 28 * i, rec.body, sizeof rec.body);
  }
}

void rinex_nav_close(void* h) { delete (NavResult*)h; }

}  // extern "C"
