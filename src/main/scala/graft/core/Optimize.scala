package graft.core

/** Driver-side Nelder-Mead simplex minimizer matching scipy
  * `optimize.fmin` semantics (the reference's two iterative solves:
  * compass calibration, process_adcp.py:389-397, 12 coeffs; shear-bias
  * scalar solve, process_adcp.py:1954-1984, 1 coeff with maxiter=100,
  * ftol=1e-5).
  *
  * The objective is evaluated by the caller — typically an aggregate action
  * over a cached DataFrame (or a collected small table). Defaults mirror
  * scipy fmin: xatol=1e-4, fatol=1e-4, maxiter=200*n, maxfun=200*n;
  * initial simplex perturbs each coordinate by 5% (0.00025 if zero).
  */
object Optimize {

  final case class Result(x: Array[Double], fx: Double, iters: Int, evals: Int, converged: Boolean)

  def nelderMead(
      f: Array[Double] => Double,
      x0: Array[Double],
      xatol: Double = 1e-4,
      fatol: Double = 1e-4,
      maxIter: Int = -1,
      maxFun: Int = -1): Result = {
    val n = x0.length
    val mi = if (maxIter > 0) maxIter else 200 * n
    val mf = if (maxFun > 0) maxFun else 200 * n
    val (rho, chi, psi, sigma) = (1.0, 2.0, 0.5, 0.5)

    var evals = 0
    def eval(x: Array[Double]): Double = { evals += 1; f(x) }

    // scipy initial simplex: x0 plus per-axis 5% bumps (nonzdelt=0.05,
    // zdelt=0.00025 for zero coordinates).
    var simplex = Array.tabulate(n + 1) { i =>
      if (i == 0) x0.clone()
      else {
        val y = x0.clone()
        val j = i - 1
        y(j) = if (y(j) != 0.0) (1.0 + 0.05) * y(j) else 0.00025
        y
      }
    }
    var fsim = simplex.map(eval)

    def sort(): Unit = {
      val idx = fsim.zipWithIndex.sortBy(_._1).map(_._2)
      simplex = idx.map(simplex)
      fsim = idx.map(fsim)
    }
    sort()

    var iters = 0
    var done = false
    while (!done && iters < mi && evals < mf) {
      val xDiff = (1 to n).map(i =>
        (0 until n).map(j => math.abs(simplex(i)(j) - simplex(0)(j))).max).max
      val fDiff = (1 to n).map(i => math.abs(fsim(i) - fsim(0))).max
      if (xDiff <= xatol && fDiff <= fatol) done = true
      else {
        iters += 1
        val xbar = Array.tabulate(n)(j => (0 until n).map(i => simplex(i)(j)).sum / n)
        def combine(coef: Double): Array[Double] =
          Array.tabulate(n)(j => xbar(j) + coef * (xbar(j) - simplex(n)(j)))

        def shrink(): Unit = {
          for (i <- 1 to n) {
            simplex(i) = Array.tabulate(n)(j =>
              simplex(0)(j) + sigma * (simplex(i)(j) - simplex(0)(j)))
            fsim(i) = eval(simplex(i))
          }
        }

        val xr = combine(rho); val fr = eval(xr)
        if (fr < fsim(0)) {
          val xe = combine(rho * chi); val fe = eval(xe)
          if (fe < fr) { simplex(n) = xe; fsim(n) = fe }
          else { simplex(n) = xr; fsim(n) = fr }
        } else if (fr < fsim(n - 1)) {
          simplex(n) = xr; fsim(n) = fr
        } else {
          if (fr < fsim(n)) { // outside contraction
            val xc = combine(psi * rho); val fc = eval(xc)
            if (fc <= fr) { simplex(n) = xc; fsim(n) = fc }
            else shrink()
          } else { // inside contraction
            val xcc = combine(-psi); val fcc = eval(xcc)
            if (fcc < fsim(n)) { simplex(n) = xcc; fsim(n) = fcc }
            else shrink()
          }
        }
        sort()
      }
    }
    Result(simplex(0), fsim(0), iters, evals, done)
  }
}
