function m = py2mat(arr)
  % numpy N x C x H x W -> matcaffe W x H x C x N
  m = single(arr);
  if ndims(m) == 4
    m = permute(m, [4 3 2 1]);
  end
end
