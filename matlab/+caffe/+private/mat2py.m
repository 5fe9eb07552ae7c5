function arr = mat2py(m, nd)
  % matcaffe layout -> numpy caffe layout: FULL dim reversal at rank nd
  % (reverse of the reference's matlab_to_blob copy, caffe_.cpp).  Pass
  % ``nd`` = the python-side rank: MATLAB drops trailing singleton dims,
  % which reversal turns into LEADING python dims (e.g. N=1).
  if nargin < 2
    nd = max(ndims(m), 2);
  end
  sz = ones(1, max(nd, 2));
  s = size(m);
  sz(1:numel(s)) = s;
  m = reshape(m, sz);
  arr = py.numpy.asarray(single(permute(m, max(nd, 2):-1:1)));
end
