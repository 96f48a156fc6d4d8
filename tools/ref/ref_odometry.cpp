// Baseline generator: runs the REFERENCE implementation's scan-matching
// odometry (compiled directly from /root/reference — no code is copied
// into this repo) over a CARMEN log and writes its trajectory + timing
// so our accuracy/throughput claims are pinned against the real thing.
//
// Protocol mirrors CPolarMatch::runlogImproved
// (/root/reference/src/zhpsm/ZHPolar_Match.cpp:736-854): PSM against a
// keyframe reference scan, reference-switch when the error index
// exceeds 5 cm, ICP fallback, frame discard when both fail. Output goes
// to a caller-chosen path instead of the reference's hardcoded
// /mnt/hgfs/... mount, and we additionally time the pure matching work.
//
// Usage: ref_odometry <carmen log> <laser name> <out traj.txt>
//   out line format: "x_m y_m theta_rad" per matched scan (first scan
//   implicit at the origin), matching the reference's trajectory dump.

#include <cmath>
#include <cstdio>
#include <chrono>
#include <fstream>
#include <iostream>
#include <string>

#include "ZHPolar_Match.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <carmen log> <laser: LMS211|LMS151|LMS511> "
                 "<out traj>\n",
                 argv[0]);
    return 2;
  }
  const std::string log_path = argv[1];
  const std::string laser = argv[2];
  const std::string out_path = argv[3];

  CPolarMatch pm(laser);
  // CARMEN logs tag scan lines ROBOTLASER1 (readFlirt's convention,
  // ZHPolar_Match.cpp:288); the reference's own drivers use this for
  // the bundled intel/fr079/mit logs.
  if (!pm.readCarmon(log_path, "ROBOTLASER1")) {
    std::fprintf(stderr, "failed to read %s\n", log_path.c_str());
    return 1;
  }
  std::ofstream traj(out_path.c_str());
  if (!traj.is_open()) {
    std::fprintf(stderr, "failed to open %s\n", out_path.c_str());
    return 1;
  }

  // runlogImproved protocol, output redirected (ZHPolar_Match.cpp:736-854).
  double rx = 0, ry = 0, th = 0;
  double xx_last = 0, yy_last = 0, tth_last = 0;
  PMScan* ls_last = nullptr;
  PMScan* ls_ref = nullptr;
  bool first = true;
  int discarded = 0, switched = 0, n_matched = 0;

  auto t0 = std::chrono::steady_clock::now();
  for (size_t cnt = 0; cnt < pm.m_SickScans.size(); ++cnt) {
    PMScan* ls = pm.m_SickScans[cnt];
    pm.pm_preprocessScan(ls);
    if (first) {
      ls->rx = ls->ry = ls->th = 0;
      ls_last = ls_ref = ls;
      first = false;
      traj << 0.0 << " " << 0.0 << " " << 0.0 << "\n";
      continue;
    }
    ls->rx = ls_last->rx;
    ls->ry = ls_last->ry;
    ls->th = ls_last->th;
    ls_ref->rx = 0; ls_ref->ry = 0; ls_ref->th = 0;

    bool match_failed = false;
    try {
      pm.pm_psm(ls_ref, ls);
    } catch (int) {
      match_failed = true;
    }
    std::pair<PM_TYPE, PM_TYPE> err = pm.pm_error_index2(ls_last, ls);
    PM_TYPE err_idx = std::sqrt(err.first + err.second);
    if (match_failed || err_idx > 0.05) {
      ++switched;
      ls_ref = ls_last;
      ls->rx = 0; ls->ry = 0; ls->th = 0;
      ls_ref->rx = 0; ls_ref->ry = 0; ls_ref->th = 0;
      bool use_icp = false;
      try {
        pm.pm_psm(ls_ref, ls);
      } catch (int) {
        use_icp = true;
      }
      if (use_icp) {
        try {
          pm.pm_icp(ls_ref, ls);
        } catch (int) {
          ++discarded;
          // frame discarded: repeat the previous pose to keep the
          // trajectory aligned with scan indices for ATE evaluation
          traj << xx_last << " " << yy_last << " " << tth_last << "\n";
          ls->rx = 0; ls->ry = 0; ls->th = 0;
          continue;
        }
      }
      rx = xx_last;
      ry = yy_last;
      th = tth_last;
      ls_ref = ls_last;
    }
    double xx = ls->rx * std::cos(th) - ls->ry * std::sin(th) + rx;
    double yy = ls->rx * std::sin(th) + ls->ry * std::cos(th) + ry;
    double tth = th + ls->th;
    tth = std::atan2(std::sin(tth), std::cos(tth));
    traj << xx << " " << yy << " " << tth << "\n";
    ++n_matched;

    ls->rx = 0; ls->ry = 0; ls->th = 0;
    ls_last = ls;
    xx_last = xx; yy_last = yy; tth_last = tth;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::fprintf(stderr,
               "{\"scans\": %zu, \"matched\": %d, \"switched\": %d, "
               "\"discarded\": %d, \"seconds\": %.3f, "
               "\"matches_per_sec\": %.1f}\n",
               pm.m_SickScans.size(), n_matched, switched, discarded, secs,
               n_matched / secs);
  return 0;
}
